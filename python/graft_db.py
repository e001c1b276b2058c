"""PySpark-facing wrapper for the graft vector engine.

Mirrors the reference engine's Python surface (a ``VectorDB`` class
constructed over a vector file, ``build_index(start, end)``,
``search(query, k) -> [(id, distance)]``, ``len()``) on top of the
Scala/Spark implementation, so a user of the reference can switch
without changing their calling code::

    from graft_db import VectorDB

    db = VectorDB("vectors.bin", 384, 16, 32)   # or a parquet path
    db.build_index(0, n_docs)
    results = db.search(query_vector, k=2)       # [(vec_id, l2_sq), ...]

Requirements: a ``pyspark`` matching the engine's Spark version, and
the compiled graft classes (or jar) on the driver classpath, e.g.::

    SparkSession.builder.config(
        "spark.driver.extraClassPath", "/path/to/graft/classes-or-jar")

Point queries go through the engine's driver-local serving arm
(``searchLocal`` — zero Spark jobs once the probed cells are cached,
the reference's sub-millisecond shape); ``search_df`` exposes the
distributed arm as a PySpark DataFrame for batch/cluster use.
"""

from pyspark.sql import DataFrame, SparkSession


def hrw_route(key, shards, spark=None):
    """Rendezvous (highest-random-weight) shard for ``key`` over the
    ``shards`` name list — the serving-side twin of the engine's
    distributed ``hrwShard`` layout column (identical md5-prefix
    weights and tie-break, zero Spark jobs). Numeric keys route as
    their canonical integer string (``str(key)``)."""
    spark = spark or SparkSession.builder.getOrCreate()
    return spark._jvm.graft.PyFacade.hrwRoute(str(key), [str(s) for s in shards])


def fuzzy_distance(a, b, max_dist, spark=None):
    """Fuzzy-linkage candidate screen: exact edit distance between
    ``a`` and ``b`` when ``<= max_dist``, ``-1`` past the threshold —
    the same thresholded semantics the engine's blocked pair stage
    filters on (length lower bound + banded DP)."""
    spark = spark or SparkSession.builder.getOrCreate()
    return int(spark._jvm.graft.PyFacade.fuzzyDistance(str(a), str(b), int(max_dist)))


def dhash_ppm(content, spark=None):
    """Perceptual image fingerprint (dHash) of a binary P6 PPM payload
    — the serving-side twin of the engine's distributed ``dHashMedia``
    stage (identical integer BT.601 luma + gradient-sign bits, zero
    Spark jobs): fingerprint an image client-side, compare against the
    corpus census, decide before shipping."""
    spark = spark or SparkSession.builder.getOrCreate()
    return int(spark._jvm.graft.PyFacade.dhashPpm(bytearray(content)))


def secret_scan(text, min_len=16, min_entropy=2.5, spark=None):
    """High-entropy secret screen of one document (admission-time
    serving call) — the serving-side twin of the engine's distributed
    ``secretScan`` stage (identical shape prefilter + integer-exact
    Shannon-entropy verdict, zero Spark jobs). Returns a list of
    ``(token, entropy)`` pairs in first-occurrence order."""
    spark = spark or SparkSession.builder.getOrCreate()
    r = spark._jvm.graft.PyFacade.secretScan(str(text), int(min_len), float(min_entropy))
    return list(zip(list(r.tokens()), list(r.entropies())))


def redact_secrets(text, min_len=16, min_entropy=2.5, spark=None):
    """Rewrite one document's flagged high-entropy fragments to
    ``<SECRET>`` — the serving-side twin of the engine's row-local
    ``redactSecrets`` column (identical split/verdict/rejoin)."""
    spark = spark or SparkSession.builder.getOrCreate()
    return spark._jvm.graft.PyFacade.redactSecrets(
        str(text), int(min_len), float(min_entropy))


def wordpiece_encode(text, merges, spark=None):
    """WordPiece-encode one string under a learned merge table
    (``[(left, right), ...]`` in learned order) with the classic
    ``##`` continuation presentation — the serving-side twin of the
    engine's distributed encode (identical replace chain)."""
    spark = spark or SparkSession.builder.getOrCreate()
    jm = [[str(a), str(b)] for (a, b) in merges]
    return list(spark._jvm.graft.PyFacade.wordpieceEncode(str(text), jm))


def wordpiece_decode(pieces, spark=None):
    """Detokenize one word's WordPiece piece sequence — the exact
    inverse of the ``##`` presentation (continuation markers strip,
    the terminal ``</w>`` drops)."""
    spark = spark or SparkSession.builder.getOrCreate()
    return spark._jvm.graft.PyFacade.wordpieceDecode([str(p) for p in pieces])


def unigram_encode(word, model, spark=None):
    """Viterbi-segment one word under a trained unigram-LM piece model
    (``{piece: lp_units}`` integer log-prob units) — the EXACT routine
    the engine broadcasts to executors for corpus segmentation."""
    spark = spark or SparkSession.builder.getOrCreate()
    jmap = spark._jvm.java.util.HashMap()
    for k, v in model.items():
        jmap.put(str(k), int(v))
    return list(spark._jvm.graft.PyFacade.unigramEncode(str(word), jmap))


class SharedTraining:
    """Opaque corpus-global training artifact (router + codebooks /
    bounds / permutation / max-norm) — the piece that makes compressed
    and dot shards buildable in parallel and MERGEABLE. Produced by
    :func:`shared_train` (or ``VectorDB.reshare``); pass it to
    ``VectorDB.build_index_shared`` on every shard. ``fingerprint`` is
    the SHA-256 content identity the merge gate compares — log or
    persist it to verify every shard encoded against the SAME
    training."""

    def __init__(self, jt, spark):
        self._jt = jt
        self._spark = spark

    @property
    def fingerprint(self):
        return str(self._spark._jvm.graft.PyFacade.sharedFingerprint(self._jt))


def shared_train(corpus, mode, metric="l2", num_cells=16, router_iters=1,
                 num_sub=8, codebook_k=16, pq_iters=0, norm_bound_sq=0.0):
    """ONE training pass over ``corpus`` (a ``VectorDB`` handle over
    the union corpus, or over a sample — see the engine's sample
    contract) producing every corpus-global artifact ``mode``
    (``"ivf"``/``"pq"``/``"opq"``/``"sq"``/``"bq"``) needs under
    ``metric``. The 100 TB build shape::

        t = shared_train(VectorDB(union_path, dims), "pq")
        # each shard, in its own job:
        shard = VectorDB(shard_path, dims).build_index_shared(t).save(out)
        # then once, on the driver:
        merged = loaded_shards[0].merge(*loaded_shards[1:])

    ``norm_bound_sq`` (dot metric, sample training only): a true upper
    bound on the corpus squared norm; ``<= 0`` computes the full-pass
    bound (sampling the bound would silently lose recall — the engine
    re-checks per shard and raises)."""
    jt = corpus._facade.sharedTrain(
        corpus._jdb, mode, metric, int(num_cells), int(router_iters),
        int(num_sub), int(codebook_k), int(pq_iters), float(norm_bound_sq))
    return SharedTraining(jt, corpus._spark)


class VectorDB:
    """A vector database handle backed by the Scala engine.

    ``path`` may be a packed-float32 ``.bin`` file (the reference's
    on-disk format; ids are assigned by byte order) or a parquet table
    with ``vec_id``/``embedding`` columns.
    """

    def __init__(self, path, dimensions, m=16, ef_construction=32, spark=None):
        self._spark = spark or SparkSession.builder.getOrCreate()
        self._facade = self._spark._jvm.graft.PyFacade
        self._jdb = self._facade.open(
            self._spark._jsparkSession, path, int(dimensions), int(m),
            int(ef_construction))

    # -- index construction -------------------------------------------------

    def build_index(self, start_id=None, end_id=None, num_parts=16):
        """Build the HNSW index over ``[start_id, end_id)`` (defaults:
        everything), id-hash partitioned into ``num_parts`` cells —
        the reference's ``build_index`` surface."""
        lo = -(2 ** 63) if start_id is None else int(start_id)
        hi = (2 ** 63 - 1) if end_id is None else int(end_id)
        self._facade.buildIndexRange(self._jdb, lo, hi, int(num_parts))
        return self

    def build_index_ivf(self, num_cells=16, iters=1, metric="l2"):
        """Trained-IVF build (k-means cells + router): ``metric`` is
        ``"l2"``, ``"cosine"`` or ``"dot"`` — the serving
        configuration the engine's own gates use."""
        self._facade.buildIndexIvf(self._jdb, int(num_cells), int(iters), metric)
        return self

    def build_index_pq(self, num_cells=16, router_iters=1, num_sub=8,
                       codebook_k=16, pq_iters=0, metric="l2"):
        """IVF-PQ compressed serving (M-byte codes, ADC ranking in the
        probed cells); point queries serve driver-locally through the
        bit-exact ADC kernel mirrors — zero Spark jobs warm."""
        self._facade.buildIndexPq(self._jdb, int(num_cells), int(router_iters),
                                  int(num_sub), int(codebook_k), int(pq_iters),
                                  metric)
        return self

    def build_index_sq(self, num_cells=16, router_iters=1, metric="l2"):
        """Int8 scalar-quantized serving (4x smaller codes)."""
        self._facade.buildIndexSq(self._jdb, int(num_cells), int(router_iters),
                                  metric)
        return self

    def build_index_bq(self, num_cells=16, router_iters=1, metric="l2"):
        """1-bit sign-pattern serving (Hamming ranking)."""
        self._facade.buildIndexBq(self._jdb, int(num_cells), int(router_iters),
                                  metric)
        return self

    def build_index_shared(self, training):
        """Map-only encode of THIS shard against a corpus-global
        :class:`SharedTraining` artifact — the per-shard step of the
        parallel 100 TB build (no training job; the only aggregate is
        the dot arm's loud norm-bound re-check). Handles encoded
        against the SAME artifact (fingerprint-equal) merge on every
        serving mode, including the compressed and dot ones that
        shard-local training locks out."""
        self._facade.buildIndexShared(self._jdb, training._jt)
        return self

    def split_cells(self, max_cell_size):
        """Split serving cells that outgrew the router (the state a
        long merge-chain under a fixed shared artifact produces) —
        compressed modes only; codes never change, so exhaustive-probe
        serving is identical. Returns the derived handle; shared
        status drops (the split router diverged) — call
        :meth:`reshare` to mint a v2 artifact for late shards."""
        out = VectorDB.__new__(VectorDB)
        out._spark = self._spark
        out._facade = self._facade
        out._jdb = self._facade.splitCells(self._jdb, int(max_cell_size))
        return out

    def reshare(self):
        """Mint a v2 :class:`SharedTraining` artifact from this
        handle's CURRENT serving state (post-``split_cells``: new
        router, carried global codebooks/bounds — zero jobs, no
        re-encoding), so a rolling merge pipeline never dead-ends:
        late shards ``build_index_shared(v2)`` and ``merge`` proceeds;
        v1-encoded shards raise the fingerprint-mismatch error."""
        return SharedTraining(self._facade.reshare(self._jdb), self._spark)

    def configure(self, nprobe=3, ef_search=0, adaptive_alpha=0.0):
        """Serving knobs: probed cells per query, beam width (0 =
        engine default), adaptive probe cost-growth bound
        (``<= 0`` disables; valid settings are ``>= 1`` — a fraction
        in ``(0, 1)`` raises rather than silently disabling)."""
        self._facade.configure(self._jdb, int(nprobe), int(ef_search),
                               float(adaptive_alpha))
        return self

    def configure_graph_route(self, ef):
        """Centroid-graph routing (the sublinear coarse-quantizer walk
        for handles whose CELL COUNT is itself large): ``ef > 0``
        routes queries through an HNSW over the centroid table at that
        beam width — ``ef >= num_cells`` is exhaustive (identical to
        flat routing); ``ef <= 0`` restores the flat centroid scan."""
        self._facade.configureGraphRoute(self._jdb, int(ef))
        return self

    # -- serving ------------------------------------------------------------

    def search(self, query, k):
        """Top-``k`` as ``[(vec_id, distance)]`` ascending — the
        in-process point-query arm (zero Spark jobs when warm). The
        query ships as ONE packed-float32 byte array (a boxed
        per-element list costs several ms of py4j marshalling per
        call)."""
        import struct
        packed = struct.pack("<%df" % len(query), *(float(x) for x in query))
        res = self._facade.searchPacked(self._jdb, bytearray(packed), int(k))
        return list(zip(res.ids(), res.dists()))

    def search_df(self, query, k):
        """The distributed serving arm as a PySpark DataFrame."""
        jdf = self._facade.searchDf(self._jdb, [float(x) for x in query], int(k))
        return DataFrame(jdf, self._spark)

    def len(self):
        """Number of vectors (the reference's ``len()``)."""
        return int(self._facade.length(self._jdb))

    def __len__(self):
        return self.len()

    # -- composition ---------------------------------------------------------

    def merge(self, *others):
        """Merge independently built shard handles into ONE serving
        handle — the 100 TB parallel-build orchestration: build and
        ``save`` each shard in its own job, ``load`` and merge here
        (no cell graph rebuilds; one duplicate-id check; the router
        re-derives from the merged layout). Unsound merges — duplicate
        ids, metric/parameter mismatches, shard-local compressed or
        dot training — raise with the engine's exact diagnosis."""
        jothers = self._spark._jvm.java.util.ArrayList()
        for o in others:
            jothers.add(o._jdb)
        merged = VectorDB.__new__(VectorDB)
        merged._spark = self._spark
        merged._facade = self._facade
        merged._jdb = self._facade.mergeAllWith(self._jdb, jothers)
        return merged

    # -- persistence --------------------------------------------------------

    def save(self, path):
        """Persist the full serving state (index, router, knobs)."""
        self._facade.save(self._jdb, path)
        return self

    @classmethod
    def load(cls, path, spark=None):
        """Reload a saved handle; serves without touching the corpus."""
        spark = spark or SparkSession.builder.getOrCreate()
        db = cls.__new__(cls)
        db._spark = spark
        db._facade = spark._jvm.graft.PyFacade
        db._jdb = db._facade.load(spark._jsparkSession, path)
        return db
