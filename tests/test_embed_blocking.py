"""Embedding-LSH blocking family (``e:`` keys): trigram-vector
sign-buckets with radius-1 multi-probing."""

from pyspark.sql import functions as F

from rosette_elasticsearch_plugin_spark.operators.ann import (
    hyperplanes,
    lsh_bucket_col,
)
from rosette_elasticsearch_plugin_spark.resolution.blocking import (
    BlockingConfig,
    all_blocks,
    embed_blocks,
    trigram_vector_col,
)

NAMES = [
    "jon smith", "john smith", "jhon smith", "maria garcia",
    "m garcia", "katherine johnson", "catherine jonson", "ab",
]


def _keyed(spark, names=NAMES):
    return spark.createDataFrame(
        [(n, n) for n in names], "node string, key string"
    )


def test_embed_coblock_iff_bucket_hamming_le_2(spark):
    """Structural property of two-sided radius-1 probing: names share
    an ``e:`` key exactly when their sign buckets differ in ≤ 2
    planes."""
    cfg = BlockingConfig()
    planes = hyperplanes(cfg.embed_dim, cfg.embed_planes, cfg.embed_seed)
    kdf = _keyed(spark)
    buckets = {
        r["node"]: r["b"]
        for r in kdf.select(
            "node",
            lsh_bucket_col(
                trigram_vector_col(F.col("key"), cfg.embed_dim), planes
            ).alias("b"),
        ).collect()
    }
    keys = {}
    for r in embed_blocks(kdf).collect():
        keys.setdefault(r["node"], set()).add(r["block_key"])
    import itertools

    for a, b in itertools.combinations(NAMES, 2):
        ham = bin(buckets[a] ^ buckets[b]).count("1")
        share = bool(keys[a] & keys[b])
        assert share == (ham <= 2), (a, b, ham, share)


def test_embed_family_recall_on_fixture(spark):
    """Pairs-completeness of the e: family alone on the labeled fixture
    ≥ 0.7 (measured 0.79) — the dense signal catches multi-typo
    variants the discrete families miss."""
    import itertools
    from collections import defaultdict

    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        _name_f1_fixture,
    )
    from rosette_elasticsearch_plugin_spark.plans.er_oracle import er_key_py

    names, truth = _name_f1_fixture()
    ent = defaultdict(set)
    for _mid, eid, nm in truth:
        ent[eid].add(nm)
    tpairs = {
        tuple(sorted(p))
        for ns in ent.values()
        for p in itertools.combinations(sorted(ns), 2)
    }
    kdf = spark.createDataFrame(
        [(n, er_key_py(n)) for n in names], "node string, key string"
    )
    keys = {}
    for r in embed_blocks(kdf).collect():
        keys.setdefault(r["node"], set()).add(r["block_key"])
    hit = sum(1 for a, b in tpairs if keys.get(a, set()) & keys.get(b, set()))
    recall = hit / len(tpairs)
    assert recall >= 0.7, f"embed-family fixture recall {recall:.3f}"


def test_embed_family_in_all_blocks_and_short_names_isolated(spark):
    """use_embed adds only ``e:``-prefixed keys through all_blocks, at
    exactly planes+1 keys per name; sub-trigram names embed to the zero
    vector — one degenerate shared bucket, never a crash."""
    cfg = BlockingConfig(
        use_exact=False, use_metaphone=False, use_minhash=False,
        use_embed=True,
    )
    out = all_blocks(_keyed(spark), cfg)
    rows = out.collect()
    assert rows and all(r["block_key"].startswith("e:") for r in rows)
    per_node = {}
    for r in rows:
        per_node.setdefault(r["node"], set()).add(r["block_key"])
    assert all(
        len(v) == BlockingConfig().embed_planes + 1 for v in per_node.values()
    )
    assert "ab" in per_node  # zero-vector name still keyed


def test_embed_kernel_matches_literal(spark):
    """The Arrow bucket kernel (production encode) must be
    key-identical to the literal trigram-vector + plane-fold path, on
    the fixture vocabulary and a 5k synthetic sample at 12 planes."""
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        _name_f1_fixture,
    )
    from rosette_elasticsearch_plugin_spark.plans.er_oracle import er_key_py

    names, _ = _name_f1_fixture()
    kdf = spark.createDataFrame(
        [(n, er_key_py(n)) for n in names], "node string, key string"
    )
    lit = sorted(map(tuple, embed_blocks(kdf).collect()))
    udf = sorted(map(tuple, embed_blocks(kdf, method="udf").collect()))
    assert lit == udf

    ids = spark.range(5000)
    k = F.concat(
        F.lit("fn"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(4000)).cast("string"),
        F.lit(" ln"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).cast("string"),
    )
    sdf = ids.select(
        F.col("id").cast("string").alias("node"), k.alias("key")
    ).localCheckpoint(eager=True)
    lit2 = sorted(map(tuple, embed_blocks(sdf, planes_k=12).collect()))
    udf2 = sorted(
        map(tuple, embed_blocks(sdf, planes_k=12, method="udf").collect())
    )
    assert lit2 == udf2


def test_embed_null_key_identical_across_encode_paths(spark):
    """A NULL key must behave identically on the literal and udf encode
    paths: NULL bucket → NULL block_keys (which no equi-join ever
    matches), never the zero-vector all-signs-positive bucket."""
    kdf = spark.createDataFrame(
        [("x", "jon smith"), ("nullkey", None)], "node string, key string"
    )
    lit = sorted(map(tuple, embed_blocks(kdf).collect()))
    udf = sorted(map(tuple, embed_blocks(kdf, method="udf").collect()))
    assert lit == udf
    null_rows = [r for r in lit if r[0] == "nullkey"]
    assert null_rows and all(bk is None for _n, bk in null_rows)


def test_scheme_recall_monotone_and_consistent(spark):
    """63 subsets; recall is monotone under subset inclusion; the full
    six-family scheme attains the maximum; singleton rows agree with
    the per-family recall ladder's ordering (m > t > e > h > s > x on
    the fixture)."""
    from rosette_elasticsearch_plugin_spark.plans.driver_queries import (
        q_er_block_scheme_recall,
    )

    rows = q_er_block_scheme_recall(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 63
    rec = {frozenset(r["families"]): r["recall"] for r in rows}
    full = frozenset("xmhtse")
    assert rec[full] == max(rec.values())
    for a, ra in rec.items():
        for b, rb in rec.items():
            if a < b:
                assert ra <= rb, (a, b, ra, rb)
    singles = {next(iter(k)): v for k, v in rec.items() if len(k) == 1}
    order = sorted(singles, key=singles.get, reverse=True)
    assert order[:2] == ["m", "t"] and order[-1] == "x"
