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
