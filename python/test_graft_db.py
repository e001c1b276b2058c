"""End-to-end smoke test for the PySpark wrapper (graft_db.py).

Run after `sbt compile` with a pyspark matching the engine's Spark:

    python3 python/test_graft_db.py

Covers the whole reference Python surface: construction over parquet
AND the packed-f32 .bin format, build_index(start, end), trained-IVF
build, point search (in-process arm), the distributed DataFrame arm,
len(), and save/load.
"""
import sys, struct, tempfile, os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")
sys.path.insert(0, os.path.join(REPO, "python"))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.driver.extraClassPath",
                 os.path.join(REPO, "target/scala-2.13/classes"))
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from graft_db import VectorDB

# parquet corpus path (reference workload shape)
db = VectorDB(SF_DIR + "/embeddings.parquet", 64, 16, 32, spark=spark)
assert db.len() == 500, db.len()
db.build_index_ivf(num_cells=16, iters=1).configure(nprobe=16, ef_search=4096)

# a fractional adaptive_alpha is a misconfiguration and must raise,
# not silently fall back to fixed-nprobe serving
try:
    db.configure(nprobe=16, ef_search=4096, adaptive_alpha=0.5)
    raise AssertionError("adaptive_alpha=0.5 must raise")
except Exception as e:
    assert "adaptive_alpha" in str(e), e
print("fractional adaptive_alpha raises OK")
db.configure(nprobe=16, ef_search=4096)  # restore
qv = (spark.read.parquet(SF_DIR + "/embeddings.parquet")
      .filter("vec_id = 24").select("embedding").head()[0])
hits = db.search(qv, 5)
assert len(hits) == 5 and hits[0][0] == 24 and abs(hits[0][1]) < 1e-9, hits
assert all(hits[i][1] <= hits[i+1][1] for i in range(4)), hits
print("parquet point search OK:", hits[:3])

sdf = db.search_df(qv, 5)
rows = [(r[0], r[1]) for r in sdf.collect()]
assert sorted(rows, key=lambda t: (t[1], t[0])) == hits, (rows, hits)
print("distributed DataFrame arm OK")

# centroid-graph routing at exhaustive beam serves the flat answer
db.configure_graph_route(64)
rows_g = [(r[0], r[1]) for r in db.search_df(qv, 5).collect()]
assert sorted(rows_g, key=lambda t: (t[1], t[0])) == hits, (rows_g, hits)
db.configure_graph_route(0)  # restore flat routing
print("graph-routed arm OK")

# .bin corpus (the reference's mmap format): 20 vectors of dim 4
binf = os.path.join(tempfile.mkdtemp(), "vecs.bin")
with open(binf, "wb") as f:
    for i in range(20):
        f.write(struct.pack("<4f", i, i, i, i))
db2 = VectorDB(binf, 4, 16, 32, spark=spark)
assert db2.len() == 20
db2.build_index(0, 20)  # the reference's build_index(start, end)
h2 = db2.search([3.1, 3.1, 3.1, 3.1], 3)
assert [i for i, _ in h2] == [3, 4, 2], h2
print("bin build_index + search OK:", h2)

# save/load round trip
p = tempfile.mkdtemp() + "/saved"
db.save(p)
db3 = VectorDB.load(p, spark=spark)
assert db3.search(qv, 5) == hits
print("save/load OK")

# cosine serving through the Python surface (the reference's semantic-
# search workload shape): top hit for a corpus vector is itself at
# cosine distance ~0
dbc = VectorDB(SF_DIR + "/embeddings.parquet", 64, 16, 32, spark=spark)
dbc.build_index_ivf(num_cells=16, iters=1, metric="cosine")
dbc.configure(nprobe=16, ef_search=4096)
hc = dbc.search(qv, 3)
assert hc[0][0] == 24 and abs(hc[0][1]) < 1e-6, hc
print("cosine metric OK:", hc[0])

# error paths surface as Python exceptions, not silent wrong answers
try:
    db.search([1.0, 2.0], 5)  # wrong dimension
    raise SystemExit("FAIL: dimension mismatch not raised")
except Exception as e:
    assert "dimension" in str(e).lower(), str(e)[:200]
print("dim-mismatch raise OK")

try:
    VectorDB(binf, 3, 16, 32, spark=spark)  # 4-float records, dims=3
    raise SystemExit("FAIL: bin divisibility not raised")
except Exception as e:
    assert "multiple" in str(e).lower(), str(e)[:200]
print("bin divisibility raise OK")

# HRW routing through the Python surface: must equal an independent
# hashlib replay of the md5-prefix weights (w DESC, shard DESC ties)
from graft_db import hrw_route, fuzzy_distance
import hashlib
shards = ["shard-%02d" % i for i in range(8)]
def py_hrw(key):
    return max(shards, key=lambda s: (
        int(hashlib.md5(("%s:%s" % (key, s)).encode()).hexdigest()[:15], 16), s))
for k in [0, 1, 7, 42, 999999, "doc-x", "日本語"]:
    got = hrw_route(k, shards, spark=spark)
    want = py_hrw(str(k))
    assert got == want, (k, got, want)
print("hrw_route OK (8 shards, hashlib replay)")

# fuzzy candidate screen: exact distance under the threshold, -1 past
# it, and the length lower bound short-circuits
assert fuzzy_distance("kitten", "sitting", 3, spark=spark) == 3
assert fuzzy_distance("abc", "abd", 2, spark=spark) == 1
assert fuzzy_distance("same", "same", 0, spark=spark) == 0
assert fuzzy_distance("abc", "zzz", 2, spark=spark) == -1
assert fuzzy_distance("a", "abcdef", 2, spark=spark) == -1  # length bound
print("fuzzy_distance OK")

# dHash point arm: independent python replay of the integer BT.601
# gradient-sign hash on a constructed 4x4 P6
from graft_db import dhash_ppm
levels = [40, 30, 20, 10] + [7] * 12  # one descending row -> bits 0,1,2
ppm = b"P6\n4 4\n255\n" + bytes(v for lv in levels for v in (lv, lv, lv))
assert dhash_ppm(ppm, spark=spark) == 7
def py_dhash(pix):  # pix: 16 (r,g,b) tuples, row-major 4x4
    luma = [(299 * r + 587 * g + 114 * b) // 1000 for (r, g, b) in pix]
    h = 0
    for y in range(4):
        for x in range(3):
            if luma[y * 4 + x] > luma[y * 4 + x + 1]:
                h |= 1 << (y * 3 + x)
    return h
import random
random.seed(9)
pix = [(random.randrange(256), random.randrange(256), random.randrange(256))
       for _ in range(16)]
ppm2 = b"P6\n4 4\n255\n" + bytes(v for p in pix for v in p)
assert dhash_ppm(ppm2, spark=spark) == py_dhash(pix)
print("dhash_ppm OK (independent python replay)")

# secret screen + redaction point arms: independent python replay of
# the shape prefilter and the integer-exact entropy quantization
# (per-term HALF_UP 6-dp rounding to 1e-6 units, floored report)
from graft_db import secret_scan, redact_secrets
import math, re
from decimal import Decimal, ROUND_HALF_UP
def py_entropy(tok):
    if not tok:
        return 0.0
    n = float(len(tok))
    su = 0
    for c in dict.fromkeys(tok):  # first-occurrence order
        p = tok.count(c) / n
        v = p * math.log(p)
        su += int((Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                   * 10**6).to_integral_value())
    return math.floor(-su / 100.0) / 10000.0
def py_shape(t, min_len=16):
    return (len(t) >= min_len and re.fullmatch(r"[A-Za-z0-9+/=_-]+", t)
            and re.search(r"[A-Za-z]", t) and re.search(r"[0-9]", t))
key = "a3f8c2e917b4d605Qz01wXy2"
text = "rotate %s now or aaaaaaaaaaaaaaaa1 stays" % key
got = secret_scan(text, spark=spark)
want = [(t, py_entropy(t)) for t in dict.fromkeys(text.split())
        if py_shape(t) and py_entropy(t) >= 2.5]
assert got == want, (got, want)
assert secret_scan("plain words only here", spark=spark) == []
red = redact_secrets(text, spark=spark)
want_red = " ".join("<SECRET>" if (py_shape(f) and py_entropy(f) >= 2.5) else f
                    for f in text.split(" "))
assert red == want_red, (red, want_red)
print("secret_scan / redact_secrets OK (independent python replay)")

# wordpiece encode point arm: independent python replay of the
# spaced-form + literal replace chain + ## presentation
from graft_db import wordpiece_encode
merges = [("l", "o"), ("lo", "w"), ("low", "</w>")]
def py_wp(text, merges):
    out = []
    for tok in text.split(" "):
        if not tok:
            continue
        spaced = "  " + "".join(c + "  " for c in tok) + "</w>  "
        for a, b in merges:
            spaced = spaced.replace(" %s  %s " % (a, b), " %s%s " % (a, b))
        pieces = [p for p in spaced.split("  ") if p]
        out += [pieces[0]] + ["##" + p for p in pieces[1:]]
    return out
for t in ["low lower lowest", "zz low", "a"]:
    got = wordpiece_encode(t, merges, spark=spark)
    assert got == py_wp(t, merges), (t, got, py_wp(t, merges))
print("wordpiece_encode OK (independent python replay)")

# decode is the exact inverse of the ## presentation — including words
# that themselves start with ## or end with </w>
from graft_db import wordpiece_decode
for w in ["low", "zz", "##x", "a</w>", "#"]:
    pieces = wordpiece_encode(w, merges, spark=spark)
    back = wordpiece_decode(pieces, spark=spark)
    assert back == w, (w, pieces, back)
print("wordpiece_decode OK (round-trip incl. hostile marker words)")

# unigram encode point arm: independent python replay of the
# integer-unit Viterbi (longer-final-piece tie-break)
from graft_db import unigram_encode
model = {"a": -1203973, "b": -1203973, "ab": -1203973, "c": -2302586,
         "abc": -2500000}
def py_unigram(word, model, max_piece=4):
    n = len(word)
    NEG = None
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        for p in range(1, min(max_piece, i) + 1):
            if best[i - p] is NEG:
                continue
            u = model.get(word[i - p:i])
            if u is None:
                continue
            sc = best[i - p] + u
            if best[i] is NEG or sc > best[i] or (sc == best[i] and p > back[i]):
                best[i] = sc
                back[i] = p
    assert best[n] is not NEG, word
    out = []
    pos = n
    while pos > 0:
        p = back[pos]
        out.append(word[pos - p:pos])
        pos -= p
    return out[::-1]
for w in ["ab", "abc", "cab", "abab", "aabb"]:
    got = unigram_encode(w, model, spark=spark)
    assert got == py_unigram(w, model), (w, got, py_unigram(w, model))
print("unigram_encode OK (independent python replay)")

# compressed serving from Python: PQ build, then the point arm must
# serve the distributed DataFrame arm's answer exactly (the point arm
# runs driver-local through the bit-exact ADC kernel mirrors)
pq = VectorDB(SF_DIR + "/embeddings.parquet", 64, 16, 32, spark=spark)
pq.build_index_pq(num_cells=4, router_iters=1).configure(nprobe=3)
pq_local = pq.search(qv, 10)
pq_dist = sorted(((r[0], r[1]) for r in pq.search_df(qv, 10).collect()),
                 key=lambda t: (t[1], t[0]))
assert [(i, round(d, 9)) for i, d in pq_local] == \
       [(i, round(d, 9)) for i, d in pq_dist], (pq_local, pq_dist)
print("python compressed (PQ) point arm OK: local == distributed ADC")

# N-way shard merge from the Python driver — the 100 TB orchestration
# shape: two id-parity shard corpora, each handle built independently
# (colliding 4-cell routers), merged into one serving handle; the
# merged handle must serve both parities and unsound merges must raise
shard_dirs = []
for parity in (0, 1):
    d = tempfile.mkdtemp(prefix=f"graft_pyshard{parity}_")
    (spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .filter(f"vec_id % 2 = {parity}").write.mode("overwrite").parquet(d))
    shard_dirs.append(d)
shards = [VectorDB(d, 64, 16, 32, spark=spark).build_index_ivf(4, 1)
          for d in shard_dirs]
merged = shards[0].merge(shards[1]).configure(nprobe=8, ef_search=4096)
assert merged.len() == 500, merged.len()
for qid in (24, 25):  # one query per parity: self-hit at distance ~0
    mq = (spark.read.parquet(SF_DIR + "/embeddings.parquet")
          .filter(f"vec_id = {qid}").select("embedding").head()[0])
    mh = merged.search(mq, 3)
    assert mh[0][0] == qid and abs(mh[0][1]) < 1e-9, (qid, mh)
try:
    shards[0].merge(shards[0])
    raise AssertionError("duplicate-id merge must raise")
except Exception as e:
    assert "unique vector ids" in str(e), e
print("python shard merge OK (both parities served; duplicate ids raise)")

# shared-training workflow from the Python driver — the full 100 TB
# orchestration story: train ONCE over the union corpus, encode each
# parity shard map-only in its own handle, merge fingerprint-equal
# shards, and serve — asserting parity with a single Scala-side shared
# build over the union. Then the post-split lifecycle: split_cells
# drops shared status, reshare mints v2, a late v1 shard raises.
from graft_db import shared_train
union = VectorDB(SF_DIR + "/embeddings.parquet", 64, 16, 32, spark=spark)
t = shared_train(union, "pq", num_cells=4, router_iters=1)
assert len(t.fingerprint) == 64, t.fingerprint
pshards = [VectorDB(d, 64, 16, 32, spark=spark).build_index_shared(t)
           for d in shard_dirs]
assert all(s.len() == 250 for s in pshards)
smerged = pshards[0].merge(pshards[1]).configure(nprobe=3)
single = (VectorDB(SF_DIR + "/embeddings.parquet", 64, 16, 32, spark=spark)
          .build_index_shared(t).configure(nprobe=3))
sq_hits = smerged.search(qv, 10)
assert [(i, round(d, 9)) for i, d in sq_hits] == \
       [(i, round(d, 9)) for i, d in single.search(qv, 10)], sq_hits
# mixing artifacts must raise with the fingerprint diagnosis
t_other = shared_train(union, "pq", num_cells=8, router_iters=1)
assert t_other.fingerprint != t.fingerprint
other_shard = VectorDB(shard_dirs[1], 64, 16, 32,
                       spark=spark).build_index_shared(t_other)
try:
    pshards[0].merge(other_shard)
    raise AssertionError("fingerprint-mismatched merge must raise")
except Exception as e:
    assert "fingerprint mismatch" in str(e), e
print("python shared training OK: merged == single shared build; mixes raise")

# post-split reshare lifecycle: split the merged handle, mint v2, a
# late v1-encoded shard raises, a v2-encoded one merges and serves
split = smerged.split_cells(64)
v2 = split.reshare()
assert v2.fingerprint != t.fingerprint
try:
    split.merge(pshards[1])
    raise AssertionError("v1 shard against a v2 handle must raise")
except Exception as e:
    assert "fingerprint mismatch" in str(e), e
late_dir = tempfile.mkdtemp(prefix="graft_pylate_")
(spark.read.parquet(SF_DIR + "/embeddings.parquet")
    .filter("vec_id % 2 = 1").selectExpr("vec_id + 1000 AS vec_id",
                                         "label", "embedding")
    .write.mode("overwrite").parquet(late_dir))
late = VectorDB(late_dir, 64, 16, 32, spark=spark).build_index_shared(v2)
rolled = split.merge(late).configure(nprobe=3)
assert rolled.len() == 750, rolled.len()
print("python reshare lifecycle OK: split -> reshare -> late shard merged")

# warm point-query latency through the py4j bridge (informational):
# the Scala-side walk is ~0.2 ms; the rest is gateway round-trip
import time
db.search(qv, 5)
t0 = time.perf_counter()
runs = 100
for _ in range(runs):
    db.search(qv, 5)
ms = (time.perf_counter() - t0) * 1000.0 / runs
print(f"warm python point query: {ms:.2f} ms/query over {runs} runs")

spark.stop()
print("ALL PY OK")
