"""Training-data operators: dedup families + ANN paths."""

import math

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.operators import ann, dedup

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river shore"),  # near dup
    (4, "completely different content about spark query optimization today"),
]


def _docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_exact_dedup(spark):
    out = dedup.exact_dedup(_docs(spark)).collect()
    groups = {r["n_docs"]: r for r in out}
    assert groups[2]["keeper_doc_id"] == 1
    assert len(out) == 3  # 4 docs, one pair collapsed


def test_near_dup_pairs(spark):
    out = dedup.near_dup_pairs(_docs(spark), bands=6, rows=1, threshold=0.5)
    got = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in out.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert not any(4 in p for p in got)


def test_simhash_near_for_near_texts(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in
            dedup.simhash_signatures(_docs(spark)).collect()}
    assert sigs[1] == sigs[2]
    ham_near = bin(sigs[1] ^ sigs[3]).count("1")
    ham_far = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham_near < ham_far


def test_near_dup_mega_group_survives_bucket_cap(spark):
    """A duplicate group LARGER than the bucket cap must still be fully
    deduplicated: every copy pairs (at least) with the group's min-id
    representative via star pairing — dropping over-cap buckets would
    exempt exactly the most-duplicated boilerplate."""
    boiler = "identical boilerplate page content repeated across the web"
    rows = [(i, boiler) for i in range(12)] + [
        (100, "a genuinely unique document about spark plans")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.near_dup_pairs(df, bands=4, rows=1, threshold=0.9, max_bucket=5)
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in out.collect()}
    # all 11 non-representative copies reach doc 0
    assert {(0, i) for i in range(1, 12)} <= got
    assert not any(100 in p for p in got)


def test_brute_topk_exact_neighbors(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = ann.brute_topk(df, k=3, n_queries=1).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in ranked] == [1, 2, 3]
    assert abs(ranked[0]["cosine"] - (0.9 / math.sqrt(0.81 + 0.01))) < 1e-6
    assert ranked[2]["cosine"] == -1.0


def test_lsh_buckets_identical_vectors_collide(spark):
    vecs = [(0, [0.5] * 64), (1, [0.5] * 64), (2, [-0.5] * 64)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    planes = ann.hyperplanes(dim=64, k=6)
    got = {r["vec_id"]: r["b"] for r in df.select(
        "vec_id", ann.lsh_bucket_col(F.col("embedding"), planes).alias("b")
    ).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_lsh_topk_neighbors_collide_in_some_table(spark):
    vecs = [(i, [float(i % 3 == j) + 0.01 * i for j in range(3)]) for i in range(9)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    tables = ann.banded_hyperplanes(dim=3, tables=2, bits=2)
    out = ann.lsh_topk(df, k=2, tables=tables)
    # sanity: every returned neighbor shares ≥1 band key with its query
    keyed = {r["vec_id"]: set(r["ks"]) for r in df.select(
        "vec_id", ann.band_keys_col(F.col("embedding"), tables).alias("ks")
    ).collect()}
    rows = out.collect()
    assert rows
    for r in rows:
        assert keyed[r["query_id"]] & keyed[r["neighbor_id"]]


def test_banded_lsh_recall_on_planted_neighbors(spark):
    """Recall ≥ 0.9 vs brute force with bounded buckets.  The sf
    corpora are uniform-random vectors (measured top-1 cosine ≈ 0.41 at
    sf0.1) — no locality exists for ANY sublinear index to exploit, so
    true near neighbors are planted: each query vector gets a copy
    rotated one coordinate with 15% mixing (cosine ≈ 0.99), the realistic
    near-dup shape the LSH path exists for.  Truth = brute-force top-1
    over the planted corpus."""
    sf_dir = "/root/testdata/sf0.1"
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    v = F.col("embedding")
    rolled = F.concat(F.slice(v, F.size(v), 1), F.slice(v, 1, F.size(v) - 1))
    planted = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.zip_with(v, rolled, lambda a, b: a + F.lit(0.15) * b).alias(
            "embedding"
        ),
    )
    corpus = base.unionByName(planted).localCheckpoint(eager=True)

    n_queries = 300
    truth = {
        r["query_id"]: r["neighbor_id"]
        for r in ann.brute_topk(corpus, k=1, n_queries=n_queries).collect()
    }
    got = (
        ann.lsh_topk(corpus, k=3)
        .where(F.col("query_id") < n_queries)
        .collect()
    )
    found = {}
    for r in got:
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, t in truth.items() if t in found.get(q, set()))
    recall = hits / len(truth)
    assert recall >= 0.9, f"banded-LSH recall@planted-top1 = {recall:.3f}"


def test_ivf_full_probe_equals_brute(spark):
    """With nprobe = nlist the probed cells cover the whole corpus, so
    IVF must reproduce the exact brute-force top-k (the approximation
    comes ONLY from probing fewer cells)."""
    sf_dir = "/root/testdata/sf0.01"
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nlist = 8
    model = ann.ivf_fit(e, nlist=nlist)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ann.ivf_topk(
            e, k=3, nlist=nlist, nprobe=nlist, n_queries=20, model=model
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ann.brute_topk(e, k=3, n_queries=20).collect()
    }
    assert got == want


def test_ivf_cells_partition_and_self_probe(spark):
    """Each vector lands in exactly one of ≤ nlist cells; every query's
    probe list contains its own cell (its nearest centroid ranks first),
    so a vector can always find its planted near-duplicates."""
    sf_dir = "/root/testdata/sf0.01"
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = ann.ivf_fit(e)
    cells = ann.ivf_assign(e, model)
    n_vecs = e.count()
    assert cells.count() == n_vecs  # one row per vector
    assert cells.select("cell").distinct().count() <= ann.IVF_NLIST
    v = F.col("embedding")
    probes = e.select(
        F.col("vec_id"),
        ann.ivf_cell_col(v, ann.norm_col(v), model).alias("cell"),
        ann.ivf_probe_cells_col(v, ann.norm_col(v), model).alias("probed"),
    )
    missing = probes.where(
        ~F.array_contains(F.col("probed"), F.col("cell"))
    ).count()
    assert missing == 0
    # centroid ids are corpus vector ids: each centroid sits in its own cell
    cids = {cid for cid, _, _ in model}
    own = {
        r["vec_id"]: r["cell"]
        for r in cells.where(F.col("vec_id").isin(list(cids))).collect()
    }
    assert own == {cid: cid for cid in cids}


def test_ivf_recall_on_planted_neighbors(spark):
    """Same planted-near-duplicate protocol as the banded-LSH recall
    test: each query gets a 15%-mixed rotated copy (cosine ≈ 0.99).  A
    near-identical pair almost always quantizes to the same cell, and
    the query probes its own cell first — recall ≥ 0.9 at nprobe=4 of
    nlist=16 (scoring ~1/4 of the corpus per query)."""
    sf_dir = "/root/testdata/sf0.1"
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    v = F.col("embedding")
    rolled = F.concat(F.slice(v, F.size(v), 1), F.slice(v, 1, F.size(v) - 1))
    planted = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.zip_with(v, rolled, lambda a, b: a + F.lit(0.15) * b).alias(
            "embedding"
        ),
    )
    corpus = base.unionByName(planted).localCheckpoint(eager=True)

    n_queries = 300
    truth = {
        r["query_id"]: r["neighbor_id"]
        for r in ann.brute_topk(corpus, k=1, n_queries=n_queries).collect()
    }
    got = ann.ivf_topk(corpus, k=3, n_queries=n_queries).collect()
    found = {}
    for r in got:
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, t in truth.items() if t in found.get(q, set()))
    recall = hits / len(truth)
    assert recall >= 0.9, f"IVF recall@planted-top1 = {recall:.3f}"


def test_ivf_udf_assignment_matches_literal(spark):
    """The Arrow matmul cell assigner (the production kernel — the
    literal fold path costs ~8× more per row and its expression tree
    can't grow to large nlist) must agree with the SQL-mirrorable
    literal path on every corpus vector: both round cosines to 6
    decimals before the argmax and break ties to the smallest cid, so
    SIMD-vs-left-fold float noise is quantized away."""
    for sf in ("sf0.01", "sf0.1"):
        e = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        model = ann.ivf_fit(e)
        lit = ann.ivf_assign(e, model, method="literal")
        udf = ann.ivf_assign(e, model, method="udf").withColumnRenamed(
            "cell", "cell_udf"
        )
        diff = (
            lit.join(udf, "vec_id")
            .where(F.col("cell") != F.col("cell_udf"))
            .count()
        )
        assert diff == 0, f"{sf}: {diff} cell disagreements"


def test_ivf_topk_plan_shape(spark):
    """The IVF search plan must be: scan-side cell assignment (no
    shuffle), broadcast of the tiny probe side, and exactly ONE
    Exchange — the per-query window for top-k.  A second Exchange would
    mean the corpus is being shuffled, which is the thing IVF exists to
    avoid."""
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    df = ann.ivf_topk(e, k=3, n_queries=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan  # probes broadcast, corpus streams
    shuffles = plan.count("Exchange hashpartitioning")
    assert shuffles <= 1, f"unexpected corpus shuffle:\n{plan}"
    # the all-Arrow path must evaluate each kernel exactly ONCE: one
    # corpus-side cell assignment, one query-side probe — the join's
    # implicit isnotnull(cell) filter must not re-run them (the
    # asNondeterministic plan barrier; without it the same
    # ArrowEvalPython appeared twice per side)
    dfu = ann.ivf_topk(e, k=3, n_queries=20, method="udf")
    plan_u = dfu._jdf.queryExecution().executedPlan().toString()
    n_arrow = plan_u.count("ArrowEvalPython")
    assert n_arrow == 2, f"kernel double-evaluation:\n{plan_u}"
    assert "BroadcastExchange" in plan_u
    assert plan_u.count("Exchange hashpartitioning") <= 1


def test_band_keys_udf_matches_literal(spark):
    """The Arrow matmul band-key kernel (production scan path) must
    emit exactly the literal fold path's keys for every vector: a sign
    bit flips only if a plane dot sits within float-summation noise of
    zero, which random 64-dim data never does."""
    tables = ann.banded_hyperplanes()
    for sf in ("sf0.01", "sf0.1"):
        e = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        lit = e.select(
            "vec_id",
            ann.band_keys_col(F.col("embedding"), tables).alias("keys"),
        )
        udf = e.select(
            "vec_id",
            ann.band_keys_udf(tables)(F.col("embedding")).alias("keys_udf"),
        )
        diff = (
            lit.join(udf, "vec_id")
            .where(F.col("keys") != F.col("keys_udf"))
            .count()
        )
        assert diff == 0, f"{sf}: {diff} band-key disagreements"


def test_banded_lsh_bucket_sizes_bounded(spark):
    """No bucket above the cap survives into pairing (the scale
    guarantee that replaced the fixed 256-bucket key)."""
    sf_dir = "/root/testdata/sf0.1"
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tables = ann.banded_hyperplanes()
    keyed = e.select(
        F.explode(ann.band_keys_col(F.col("embedding"), tables)).alias("k")
    )
    sizes = keyed.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    # 2000 vectors over 6×256 buckets: natural max far below the cap
    assert sizes <= ann.ANN_MAX_BUCKET


def test_dedup_canonical_keeps_highest_quality(spark):
    """Canonical selection must keep the highest-quality member of each
    near-dup component (tie: lexicographic-min doc id), and leave
    non-duplicated docs as their own canonical."""
    from pyspark.sql import functions as F, Window

    from rosette_elasticsearch_plugin_spark.operators import dedup
    from rosette_elasticsearch_plugin_spark.functions import textstats as TS
    from rosette_elasticsearch_plugin_spark.resolution.clustering import (
        connected_components,
    )

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green forest tonight")
    rows = [
        # near-dup pair with a quality gap: doc 2 has richer text
        (1, base),
        (2, base + " with very good structure and many more words here"),
        # unrelated singleton
        (3, "completely different text about spark query planning"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.near_dup_pairs(d, threshold=0.5)
    edges = pairs.select(
        F.col("doc_id_a").cast("string").alias("node_a"),
        F.col("doc_id_b").cast("string").alias("node_b"),
    )
    comp = connected_components(
        edges, nodes=d.select(F.col("doc_id").cast("string").alias("node"))
    )
    q = d.select(
        F.col("doc_id").cast("string").alias("node"),
        TS.quality_score_col(F.col("text")).alias("quality"),
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("quality"), F.asc("node"))
    ranked = comp.join(q, "node").withColumn("rn", F.row_number().over(w))
    keepers = {
        r["cluster"]: r["node"]
        for r in ranked.where(F.col("rn") == 1).collect()
    }
    clusters = {r["node"]: r["cluster"] for r in comp.collect()}
    assert clusters["1"] == clusters["2"]  # the planted pair groups
    assert keepers[clusters["1"]] == "2"  # higher quality wins
    assert keepers[clusters["3"]] == "3"  # singleton keeps itself


def test_arrow_kernels_null_propagate_on_dirty_input(spark):
    """The production Arrow kernels (band_keys_udf / ivf_cell_udf) must
    match the literal paths' null semantics on dirty input: a NULL
    embedding or a wrong-dimension vector keys/assigns to NULL instead
    of crashing the whole batch, and clean rows in the same batch still
    get their exact keys."""
    from pyspark.sql import types as T

    dim = 8
    tables = ann.banded_hyperplanes(dim=dim, tables=2, bits=4)
    good1 = [float(i + 1) for i in range(dim)]
    good2 = [float(dim - i) for i in range(dim)]
    rows = [(1, good1), (2, None), (3, good2[:3]), (4, good2)]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    e = spark.createDataFrame(rows, schema)

    keys = {
        r["vec_id"]: r["k"]
        for r in e.select(
            "vec_id", ann.band_keys_udf(tables)(F.col("embedding")).alias("k")
        ).collect()
    }
    lit_keys = {
        r["vec_id"]: r["k"]
        for r in e.where(F.col("vec_id").isin(1, 4)).select(
            "vec_id", ann.band_keys_col(F.col("embedding"), tables).alias("k")
        ).collect()
    }
    assert keys[2] is None and keys[3] is None
    assert keys[1] == lit_keys[1] and keys[4] == lit_keys[4]

    clean = e.where(F.col("vec_id").isin(1, 4))
    model = ann.ivf_fit(clean, nlist=2)
    cells = {
        r["vec_id"]: r["cell"]
        for r in ann.ivf_assign(e, model, method="udf").collect()
    }
    lit_cells = {
        r["vec_id"]: r["cell"]
        for r in ann.ivf_assign(clean, model, method="literal").collect()
    }
    assert cells[2] is None and cells[3] is None
    assert cells[1] == lit_cells[1] and cells[4] == lit_cells[4]


def test_ivf_probe_udf_matches_literal(spark):
    """The Arrow top-nprobe probe kernel must emit exactly the literal
    fold path's probe list (same quantization, same cos-desc/cid-asc
    order) for every corpus vector."""
    for sf in ("sf0.01", "sf0.1"):
        e = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        model = ann.ivf_fit(e)
        lit = e.select(
            "vec_id",
            ann.ivf_probe_cells_col(
                F.col("embedding"), ann.norm_col(F.col("embedding")), model, 4
            ).alias("p"),
        )
        udf = e.select(
            "vec_id",
            ann.ivf_probe_cells_udf(model, 4)(F.col("embedding")).alias("pu"),
        )
        diff = (
            lit.join(udf, "vec_id")
            .where(F.col("p") != F.col("pu"))
            .count()
        )
        assert diff == 0, f"{sf}: {diff} probe-list disagreements"


def test_ivf_udf_path_recall_at_large_nlist(spark):
    """The all-Arrow IVF path (method="udf": matmul cell assignment +
    matmul probing) — the only shape that runs at the nlist ≈ √n a
    large corpus needs — must keep recall ≥ 0.9 on the planted
    protocol at nlist=64/nprobe=8 (scoring ~1/8 of the corpus per
    query).  scripts/bench_ann.py --scale runs the same pin at
    256k vectors / nlist=256."""
    sf_dir = "/root/testdata/sf0.1"
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    v = F.col("embedding")
    rolled = F.concat(F.slice(v, F.size(v), 1), F.slice(v, 1, F.size(v) - 1))
    planted = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.zip_with(v, rolled, lambda a, b: a + F.lit(0.15) * b).alias(
            "embedding"
        ),
    )
    corpus = base.unionByName(planted).localCheckpoint(eager=True)

    n_queries = 300
    truth = {
        r["query_id"]: r["neighbor_id"]
        for r in ann.brute_topk(corpus, k=1, n_queries=n_queries).collect()
    }
    got = ann.ivf_topk(
        corpus, k=3, nlist=64, nprobe=8, n_queries=n_queries, method="udf"
    ).collect()
    found = {}
    for r in got:
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, t in truth.items() if t in found.get(q, set()))
    recall = hits / len(truth)
    assert recall >= 0.9, f"udf-path IVF recall@planted-top1 = {recall:.3f}"


# --- IDF-weighted token similarity ------------------------------------------

def test_idf_weights_rare_tokens_weigh_more(spark):
    rows = [
        (1, "the zebra"),
        (2, "the quokka"),
        (3, "the heron"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["token"]: r for r in dedup.idf_weights(df).collect()}
    assert got["the"]["df"] == 3 and got["zebra"]["df"] == 1
    # smoothed idf: ln((N+1)/(df+1)) + 1 with N=3
    assert got["the"]["idf"] == round(math.log(4 / 4) + 1.0, 6) == 1.0
    assert got["zebra"]["idf"] == round(math.log(4 / 2) + 1.0, 6)
    assert got["zebra"]["idf"] > got["the"]["idf"]


def test_weighted_jaccard_first_principles_and_boilerplate_downweighting(spark):
    # docs 1/2 share only BOILERPLATE (corpus-wide tokens) and differ in
    # rare ones; docs 3/4 share RARE tokens and differ in boilerplate.
    # Same machinery as production: pairs from banded MinHash buckets.
    rows = [
        (1, "the of and to in zebra"),
        (2, "the of and to in quokka"),
        (3, "xylophone quartz nebula the of"),
        (4, "xylophone quartz nebula and to"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id_a"], r["doc_id_b"]): r
        for r in dedup.weighted_jaccard_scores(df, bands=12, rows=1).collect()
    }
    assert (1, 2) in out and (3, 4) in out

    # first-principles recompute of every emitted pair from the corpus
    toks = {d: set(t.split()) for d, t in rows}
    n = len(rows)
    dfreq: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            dfreq[t] = dfreq.get(t, 0) + 1
    idf = {t: round(math.log((n + 1) / (c + 1)) + 1.0, 6) for t, c in dfreq.items()}
    for (a, b), r in out.items():
        inter, union = toks[a] & toks[b], toks[a] | toks[b]
        assert r["token_jaccard"] == round(len(inter) / len(union), 6)
        expected_w = round(
            sum(idf[t] for t in inter) / sum(idf[t] for t in union), 6
        )
        assert abs(r["weighted_jaccard"] - expected_w) <= 1e-6

    # the weighting's point: shared boilerplate scores BELOW the plain
    # Jaccard, shared rare content scores ABOVE it
    assert out[(1, 2)]["weighted_jaccard"] < out[(1, 2)]["token_jaccard"]
    assert out[(3, 4)]["weighted_jaccard"] > out[(3, 4)]["token_jaccard"]


def test_kmeans_recovers_planted_clusters(spark):
    """k=2 Lloyd on two well-separated blobs recovers the partition
    exactly, regardless of which seed vectors the hash sample picks."""
    import random

    from rosette_elasticsearch_plugin_spark.operators.ann import (
        kmeans_assignments,
    )

    rng = random.Random(7)
    rows = []
    for i in range(40):
        blob = i % 2
        base = [5.0, 0.0, 0.0] if blob == 0 else [0.0, 5.0, 0.0]
        rows.append(
            (i, [x + rng.uniform(-0.3, 0.3) for x in base], blob)
        )
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assignments(df, k=2, iters=3).collect()
    }
    assert len(got) == 40
    by_label = {0: set(), 1: set()}
    for i, _v, lab in rows:
        by_label[lab].add(got[i])
    # each blob maps to exactly one cluster, and they differ
    assert len(by_label[0]) == 1 and len(by_label[1]) == 1
    assert by_label[0] != by_label[1]


def test_kmeans_empty_cell_keeps_centroid(spark):
    """A seed whose cell empties out must survive as a centroid (the
    Lloyd convention) — the run must not crash or drop to k-1 cells."""
    from rosette_elasticsearch_plugin_spark.operators.ann import (
        kmeans_assignments,
    )

    # 6 near-identical vectors: most seeds win nothing after round 1
    rows = [(i, [1.0, 1.0 + i * 1e-4]) for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = kmeans_assignments(df, k=4, iters=3).collect()
    assert len(got) == 6
    assert len({r.cluster for r in got}) >= 1


def test_semantic_dedup_drops_planted_dups_within_cells(spark):
    """SemDeDup: two well-separated blobs, each with a trio of
    near-identical vectors planted inside it.  The trios must collapse
    to their min-id representative; every other vector keeps itself.
    Cross-blob vectors must never share a component (cells separate
    them before any pairing)."""
    import random

    from rosette_elasticsearch_plugin_spark.operators.ann import (
        semantic_dedup,
    )

    rng = random.Random(11)
    rows = []
    vid = 0
    planted = []
    for blob, base in ((0, [5.0, 0.0, 0.0]), (1, [0.0, 5.0, 0.0])):
        # a trio of near-identical vectors (cosine ≈ 1 pairwise)
        trio_base = [x + rng.uniform(-0.2, 0.2) for x in base]
        trio = []
        for _ in range(3):
            rows.append(
                (vid, [x + rng.uniform(-0.005, 0.005) for x in trio_base])
            )
            trio.append(vid)
            vid += 1
        planted.append(trio)
        # background vectors: same blob but angularly spread enough to
        # stay under τ=0.97 against everything
        for j in range(8):
            spread = [x + rng.uniform(-1.8, 1.8) for x in base]
            spread[2] += 3.0 * (j - 4)
            rows.append((vid, spread))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r.vec_id: (r.cell, r.sem_rep, r.is_kept)
        for r in semantic_dedup(df, k=2, iters=3, tau=0.97).collect()
    }
    assert len(out) == len(rows)
    for trio in planted:
        reps = {out[i][1] for i in trio}
        assert reps == {min(trio)}, f"trio {trio} reps {reps}"
        assert out[min(trio)][2] is True
        for i in trio:
            if i != min(trio):
                assert out[i][2] is False
    # the two trios live in different cells and different components
    assert out[planted[0][0]][0] != out[planted[1][0]][0]
    assert out[planted[0][0]][1] != out[planted[1][0]][1]


def test_multiprobe_recall_on_planted_neighbors(spark):
    """Same planted-near-duplicate protocol as the banded-LSH recall
    test, for the single-table multi-probe path: a planted copy differs
    from its query in few sign bits, so probing the query's bucket plus
    every radius-1 flip must recover it with recall >= 0.9 — at ONE
    table's index size instead of six."""
    sf_dir = "/root/testdata/sf0.1"
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    v = F.col("embedding")
    rolled = F.concat(F.slice(v, F.size(v), 1), F.slice(v, 1, F.size(v) - 1))
    planted = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.zip_with(v, rolled, lambda a, b: a + F.lit(0.15) * b).alias(
            "embedding"
        ),
    )
    corpus = base.unionByName(planted).localCheckpoint(eager=True)

    n_queries = 300
    truth = {
        r["query_id"]: r["neighbor_id"]
        for r in ann.brute_topk(corpus, k=1, n_queries=n_queries).collect()
    }
    got = (
        ann.multiprobe_topk(corpus, k=3)
        .where(F.col("query_id") < n_queries)
        .collect()
    )
    found = {}
    for r in got:
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, t in truth.items() if t in found.get(q, set()))
    recall = hits / len(truth)
    assert recall >= 0.9, f"multi-probe recall@planted-top1 = {recall:.3f}"


def test_multiprobe_pairs_unique_and_radius_bounded(spark):
    """Structural pins: a (query, neighbor) pair is scored at most once
    (the probe list is distinct and a neighbor has one bucket), and
    every scored pair's buckets differ in at most one sign bit."""
    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planes = ann.hyperplanes(64, ann.MP_BITS)
    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", ann.lsh_bucket_col(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    got = ann.multiprobe_topk(emb, k=1000).collect()
    seen = set()
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        assert key not in seen
        seen.add(key)
        diff = buckets[r["query_id"]] ^ buckets[r["neighbor_id"]]
        assert bin(diff).count("1") <= 1


# --- product quantization (PQ / IVF-PQ) ----------------------------------------


def _planted_corpus(spark, sf_dir):
    """The planted-near-duplicate protocol of the LSH/IVF recall tests:
    each base vector gets a copy mixed 15% with its one-rolled self
    (cosine ≈ 0.99 / tiny L2 gap) — the near-dup shape sublinear
    indexes exist for, since the sf corpora themselves are uniform."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    v = F.col("embedding")
    rolled = F.concat(F.slice(v, F.size(v), 1), F.slice(v, 1, F.size(v) - 1))
    planted = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.zip_with(v, rolled, lambda a, b: a + F.lit(0.15) * b).alias(
            "embedding"
        ),
    )
    return base.unionByName(planted).localCheckpoint(eager=True)


def test_pq_encode_literal_udf_agree(spark):
    """The Arrow numpy encoder (the large-codebook production kernel)
    must produce byte-identical codes to the SQL-mirrorable literal
    fold path on both sf corpora."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        books = ann.pq_fit(e)
        lit = e.select(
            "vec_id", ann.pq_codes_col(F.col("embedding"), books).alias("c")
        )
        udf = e.select(
            "vec_id", ann.pq_encode_udf(books)(F.col("embedding")).alias("c2")
        )
        n = lit.join(udf, "vec_id").where(F.col("c") != F.col("c2")).count()
        assert n == 0, f"{sf_dir}: {n} literal-vs-udf code mismatches"


def test_pq_encode_udf_null_propagates(spark):
    """NULL and wrong-dimension vectors encode to NULL codes (the
    band_keys_udf robustness rule), on both paths."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = ann.pq_fit(e)
    dirty = spark.createDataFrame(
        [(1, None), (2, [0.5, 0.25])],
        "vec_id long, embedding array<float>",
    )
    for enc in (
        ann.pq_codes_col(F.col("embedding"), books),
        ann.pq_encode_udf(books)(F.col("embedding")),
    ):
        rows = dirty.select(enc.alias("c")).collect()
        assert all(r["c"] is None for r in rows)


def test_pq_full_shortlist_equals_brute_l2(spark):
    """With the shortlist covering the whole corpus the exact re-rank
    must reproduce brute-force squared-L2 top-k exactly — the ADC
    approximation only ever narrows the candidate set."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = e.count()
    truth = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann.brute_l2_topk(e, k=3, n_queries=20).collect()
    }
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann.pq_topk(e, k=3, shortlist=n, n_queries=20).collect()
    }
    assert got == truth


def test_pq_recall_on_planted_neighbors(spark):
    """Planted near-duplicates share all m codes (ADC ≈ 0) and must be
    retrieved: recall ≥ 0.9 vs exact-L2 top-1, Arrow encode path."""
    corpus = _planted_corpus(spark, "/root/testdata/sf0.01")
    n_queries = 100
    books = ann.pq_fit(corpus)
    truth = {
        r["query_id"]: r["neighbor_id"]
        for r in ann.brute_l2_topk(corpus, k=1, n_queries=n_queries).collect()
    }
    found = {}
    for r in ann.pq_topk(
        corpus, k=3, n_queries=n_queries, books=books, method="udf"
    ).collect():
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, t in truth.items() if t in found.get(q, set()))
    recall = hits / len(truth)
    assert recall >= 0.9, f"PQ recall@planted-top1 = {recall:.3f}"


def test_ivfpq_recall_on_planted_neighbors(spark):
    """A planted duplicate also lands in (or next to) its source's
    coarse cell, so IVF-PQ keeps the planted recall with only
    nprobe/nlist of the corpus ADC-scored."""
    corpus = _planted_corpus(spark, "/root/testdata/sf0.01")
    n_queries = 100
    books = ann.pq_fit(corpus)
    truth = {
        r["query_id"]: r["neighbor_id"]
        for r in ann.brute_l2_topk(corpus, k=1, n_queries=n_queries).collect()
    }
    found = {}
    for r in ann.ivfpq_topk(
        corpus, k=3, n_queries=n_queries, books=books, method="udf"
    ).collect():
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, t in truth.items() if t in found.get(q, set()))
    recall = hits / len(truth)
    assert recall >= 0.9, f"IVF-PQ recall@planted-top1 = {recall:.3f}"


# --- content-defined chunking --------------------------------------------------


def _cdc_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cdc_chunks_partition_document(spark):
    """Chunks tile [1, n] exactly: consecutive 0-based indexes,
    contiguous starts, lengths summing to the doc length."""
    text = " ".join(f"word{i} token value" for i in range(40))
    rows = (
        dedup.cdc_chunks(_cdc_df(spark, [(1, text)]))
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    pos = 1
    for r in rows:
        assert r["chunk_start"] == pos
        pos += r["chunk_len"]
    assert pos - 1 == len(text)


def test_cdc_chunks_edge_cases(spark):
    """NULL/empty text → no rows; shorter-than-window text → one
    whole-document chunk."""
    rows = dedup.cdc_chunks(
        _cdc_df(spark, [(1, None), (2, ""), (3, "abc")])
    ).collect()
    assert [(r["doc_id"], r["chunk_start"], r["chunk_len"]) for r in rows] == [
        (3, 1, 3)
    ]


def test_cdc_boundary_stability_under_edit(spark):
    """The content-defined property: inserting text mid-document leaves
    chunks outside the edited neighbourhood with IDENTICAL hashes —
    the invariant fixed-size chunking lacks."""
    base = " ".join(f"alpha{i} beta gamma delta" for i in range(40))
    edited = base[:300] + " INSERTED NOISE SPAN " + base[300:]
    chunks = dedup.cdc_chunks(_cdc_df(spark, [(1, base), (2, edited)]))
    hashes = {
        did: {r["chunk_hash"] for r in grp}
        for did, grp in __import__("itertools").groupby(
            sorted(chunks.collect(), key=lambda r: r["doc_id"]),
            key=lambda r: r["doc_id"],
        )
    }
    shared = hashes[1] & hashes[2]
    assert len(shared) >= len(hashes[1]) / 2, (
        f"only {len(shared)}/{len(hashes[1])} chunks survived the edit"
    )
    assert hashes[2] - hashes[1], (
        "the inserted span must appear as new chunk content"
    )


def test_cdc_pairs_partial_overlap(spark):
    """A document sharing its first half with another pairs up; an
    unrelated document does not."""
    a = " ".join(f"shared{i} corpus token" for i in range(30))
    b = a[: len(a) // 2] + " " + " ".join(
        f"tail{i} different words" for i in range(15)
    )
    c = " ".join(f"unrelated{i} material here" for i in range(30))
    chunks = dedup.cdc_chunks(_cdc_df(spark, [(1, a), (2, b), (3, c)]))
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["overlap"]
        for r in dedup.cdc_pairs(chunks, threshold=0.3).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.3
    assert not any(3 in p for p in got)


def test_pq_adc_kernel_matches_literal(spark):
    """The LUT-scan ADC kernel (with in-kernel shortlist pruning) must
    reproduce the literal per-pair expression's final top-k EXACTLY —
    ids, adc and exact distances — on both sf corpora."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        books = ann.pq_fit(e)
        lit = sorted(
            map(tuple, ann.pq_topk(e, k=3, n_queries=30, books=books).collect())
        )
        ker = sorted(
            map(
                tuple,
                ann.pq_topk(
                    e, k=3, n_queries=30, books=books,
                    method="udf", adc="kernel",
                ).collect(),
            )
        )
        assert lit == ker, f"{sf_dir}: kernel ADC diverged from literal"


def test_containment_finds_quoted_subset(spark):
    """A short doc pasted inside a long one: containment(A in B) = 1.0
    even though Jaccard is low; the reverse direction and unrelated
    docs stay out."""
    quote = "the quick brown fox jumps over the lazy dog every day"
    long_doc = (
        "padding words before the insert start here middle text " + quote +
        " and then a very long tail " +
        " ".join(f"tail{i} filler content words" for i in range(20))
    )
    other = " ".join(f"unrelated{i} material entirely" for i in range(20))
    df = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, other)], "doc_id long, text string"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["containment"]
        for r in dedup.containment_pairs(df).collect()
    }
    assert got.get((1, 2)) == 1.0
    assert (2, 1) not in got  # the long doc is NOT inside the quote
    assert not any(3 in p for p in got)


def test_containment_threshold_integer_boundary(spark):
    """τ = 4/5 exactly: a doc sharing exactly 4 of its 5 shingles is
    kept, 3 of 5 is not — the integer comparison has no float edge."""
    # 7 tokens -> 5 trigram shingles; b shares 4 of them (one token
    # changed at the end), c shares 3
    a = "t1 t2 t3 t4 t5 t6 t7"
    b = "t1 t2 t3 t4 t5 t6 x7"
    c = "t1 t2 t3 t4 t5 x6 x7"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["n_shared"]
        for r in dedup.containment_pairs(df).collect()
    }
    assert got.get((1, 2)) == 4
    assert (1, 3) not in got


def test_cdc_incremental_equals_full(spark):
    """prior-batch pairs ∪ incremental(delta) must equal the one-shot
    cdc_pairs over the whole corpus, including cross-batch and
    new×new pairs; chunking kernels run only on the delta."""
    base = " ".join(f"shared{i} corpus token" for i in range(30))
    rows = [
        (1, base),
        (2, base + " tiny tail change"),
        (5, "something else entirely " * 5),
        (10, base),                      # new batch: dup of 1 (cross)
        (15, base + " tiny tail change"),  # new: dup of 2 (cross)
        (20, "another unrelated doc " * 5),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    batch1 = d.where(F.col("doc_id") < 10)
    batch2 = d.where(F.col("doc_id") >= 10)
    full = {
        (r["doc_id_a"], r["doc_id_b"]): (r["n_shared"], r["overlap"])
        for r in dedup.cdc_pairs(dedup.cdc_chunks(d)).collect()
    }
    prior_index = dedup.extend_chunk_index(None, batch1)
    got = {
        (r["doc_id_a"], r["doc_id_b"]): (r["n_shared"], r["overlap"])
        for r in dedup.cdc_pairs(prior_index)
        .unionByName(dedup.incremental_cdc_pairs(prior_index, batch2))
        .collect()
    }
    assert got == full
    # sanity: the case exercises cross-batch AND new×new pairs
    assert any(a < 10 <= b for a, b in full)
    assert any(a >= 10 and b >= 10 for a, b in full)


def test_pq_topk_drops_dirty_vectors(spark):
    """NULL / wrong-dimension corpus vectors must never appear in the
    top-k (ascending sort is NULLS FIRST by default — the ranking
    window drops NULL distances), and the kernel path must agree;
    a NULL query vector yields no rows for that query on both paths."""
    base = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    dirty = spark.createDataFrame(
        [(900000, None), (900001, [0.5, 0.25])],
        "vec_id long, embedding array<float>",
    )
    nullq = spark.createDataFrame(
        [(0, None)], "vec_id long, embedding array<float>"
    )
    corpus = (
        base.where(F.col("vec_id") > 0)
        .unionByName(dirty)
        .unionByName(nullq)
        .localCheckpoint(eager=True)
    )
    books = ann.pq_fit(corpus)
    lit = ann.pq_topk(corpus, k=3, n_queries=20, books=books).collect()
    ker = ann.pq_topk(
        corpus, k=3, n_queries=20, books=books, method="udf", adc="kernel"
    ).collect()
    for rows in (lit, ker):
        assert rows, "clean queries must still return neighbors"
        assert all(r["neighbor_id"] < 900000 for r in rows)
        assert all(r["adc_dist"] is not None for r in rows)
        assert all(r["query_id"] != 0 for r in rows)  # null query: no rows
    assert sorted(map(tuple, lit)) == sorted(map(tuple, ker))


def test_pq_incremental_equals_full_reencode(spark):
    """Delta-proportional PQ maintenance: committed-base codes + a
    delta-only encode under the FROZEN base-fit codebook must equal the
    full re-encode of base ∪ delta under that same codebook — and the
    delta books must really be fit on the base alone (drop the delta
    from the fit sample and nothing changes; codes are per-vector given
    the books)."""
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        PQ_INCR_MOD,
        _pq_codes_long,
        q_ann_pq_codes_incremental,
    )

    sf_dir = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = e.where(F.col("vec_id") % PQ_INCR_MOD != 0)
    books = ann.pq_fit(base)
    full = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in _pq_codes_long(e, books).collect()
    }
    incr = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in q_ann_pq_codes_incremental(spark, sf_dir).collect()
    }
    assert incr == full
    n_delta = e.where(F.col("vec_id") % PQ_INCR_MOD == 0).count()
    assert 0 < n_delta < e.count() // 10  # the delta really is ~5%
