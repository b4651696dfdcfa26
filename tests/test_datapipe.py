"""Datapipe operator tests on small deterministic fixtures."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog and walks away fast"),  # near dup of 1
        (4, "completely different content about databases and query engines here"),
        (5, "el gato y el perro de la casa que juega con los juguetes por la tarde"),
        (6, ""),  # empty doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedup:
    def test_exact(self, docs):
        from qlbridge_spark.datapipe import dedup_exact

        out = dedup_exact(docs, ["text"], keep="doc_id")
        kept = sorted(r["doc_id"] for r in out.collect())
        assert kept == [1, 3, 4, 5, 6]  # doc 2 dropped, min id kept

    def test_minhash_pairs_finds_near_dup(self, docs):
        from qlbridge_spark.datapipe import minhash_pairs

        pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in minhash_pairs(docs, "doc_id", "text", threshold=0.3, bands=32).collect()}
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical texts
        assert (1, 3) in pairs  # one-word edit
        assert not any(4 in p or 5 in p for p in pairs)

    def test_minhash_dedup(self, docs):
        from qlbridge_spark.datapipe import minhash_dedup

        kept = sorted(r["doc_id"] for r in minhash_dedup(docs, "doc_id", "text", threshold=0.3, bands=32).collect())
        assert 1 in kept and 2 not in kept and 3 not in kept
        assert 4 in kept and 5 in kept

    def test_dedup_keep_best_picks_highest_score(self, spark):
        from pyspark.sql import functions as F2

        from qlbridge_spark.datapipe import dedup_keep_best

        df = spark.createDataFrame(
            [(1, 10), (2, 50), (3, 30), (4, 99), (9, 7)], "id long, q long"
        )
        # transitive chain 1~2~3 (no direct 1-3 pair) + isolated 4, 9
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        kept = sorted(r["id"] for r in dedup_keep_best(df, "id", pairs, "q").collect())
        # cluster {1,2,3}: best q=50 is id 2 (NOT min id 1); 4 and 9 untouched
        assert kept == [2, 4, 9]

    def test_dedup_keep_best_tie_breaks_min_id(self, spark):
        from qlbridge_spark.datapipe import dedup_keep_best

        df = spark.createDataFrame([(5, 10), (6, 10), (7, 3)], "id long, q long")
        pairs = spark.createDataFrame([(5, 6), (6, 7)], "id_a long, id_b long")
        kept = sorted(r["id"] for r in dedup_keep_best(df, "id", pairs, "q").collect())
        assert kept == [5]

    def test_simhash_pairs(self, spark):
        # SimHash discriminates on LONG documents (few bit-votes flip per
        # edit); tiny docs are minhash territory. 500-token docs:
        import random

        from qlbridge_spark.datapipe import simhash_pairs

        rnd = random.Random(3)
        vocab = [f"word{i}" for i in range(800)]
        base = [rnd.choice(vocab) for _ in range(500)]
        mod = list(base)
        for i in range(0, 500, 25):
            mod[i] = f"X{i}"  # 20 edits
        rows = [
            (1, " ".join(base)),
            (2, " ".join(base)),  # exact dup
            (3, " ".join(mod)),  # 4% edited
            (4, " ".join(rnd.choice(vocab) for _ in range(500))),  # unrelated
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(df, "doc_id", "text", max_hamming=8).collect()}
        assert pairs[(1, 2)] == 0
        assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 8
        assert not any(4 in (a, b) for a, b in pairs)

    def test_ngram_jaccard_exact_values(self, docs):
        from qlbridge_spark.datapipe import ngram_jaccard_pairs

        pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.1).collect()}
        assert pairs[(1, 2)] == 1.0
        # docs 1,3 differ in 1 word of 12 → 3-gram sets overlap partially
        assert 0.3 < pairs[(1, 3)] < 0.9

    def test_embedding_dup_pairs(self, spark):
        from qlbridge_spark.datapipe import embedding_dup_pairs

        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),  # near dup of 1
            (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = [(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(df, "vec_id", "embedding", threshold=0.99).collect()]
        assert pairs == [(1, 2)]


class TestSimilarity:
    def test_brute_force_topk_ordering(self, spark):
        from qlbridge_spark.datapipe import cosine_topk

        rows = [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.5, 0.5]),
            (3, [0.0, 1.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = df.filter(F.col("vec_id") == 0)
        out = cosine_topk(df, q, k=3).collect()
        assert [r["neighbor_id"] for r in out] == [1, 2, 3]
        assert [r["rank"] for r in out] == [1, 2, 3]

    def test_ivf_recall_on_small_set(self, spark):
        from qlbridge_spark.datapipe import cosine_topk, ivf_build, ivf_topk

        import random

        rnd = random.Random(1)
        rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(100)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = df.filter(F.col("vec_id") < 3)
        exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(df, q, k=5).collect()}
        assigned, cents = ivf_build(df, n_cells=4)
        approx = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(assigned, cents, q, k=5, nprobe=3).collect()}
        # nprobe=3/4 cells → recall should be high on 100 vectors
        assert len(exact & approx) / len(exact) >= 0.5


class TestText:
    def test_lang_id(self, docs):
        from qlbridge_spark.datapipe import lang_id

        out = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
        assert out[1] == "en" and out[5] == "es" and out[6] == "unknown"

    def test_token_count(self, spark):
        from qlbridge_spark.datapipe import token_count

        df = spark.createDataFrame([("hello world, it's 42 degrees  ",)], "text string")
        r = df.select(
            token_count(F.col("text")).alias("ws"), token_count(F.col("text"), "bpe").alias("bpe")
        ).collect()[0]
        assert r["ws"] == 5
        # hello|world|,|it|'|s|42|degrees
        assert r["bpe"] == 8

    def test_quality_score_bounds(self, docs):
        from qlbridge_spark.datapipe import quality_score

        vals = [r[0] for r in docs.filter("text != ''").select(quality_score(F.col("text"))).collect()]
        assert all(0.0 <= v <= 1.0 for v in vals)

    def test_fingerprint_modes(self, docs):
        from qlbridge_spark.datapipe import fingerprint

        out = docs.select("doc_id", fingerprint(F.col("text")).alias("fp"), fingerprint(F.col("text"), "rolling").alias("rp")).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["fp"] == by_id[2]["fp"]
        assert by_id[1]["rp"] == by_id[2]["rp"]
        assert by_id[1]["fp"] != by_id[4]["fp"]


class TestMultimodal:
    def test_decode_plumbing(self, docs):
        from qlbridge_spark.datapipe.multimodal import attach_fake_payload, decode_features, frame_sample

        mm = attach_fake_payload(docs.filter("text != ''"), "doc_id", "text")
        feats = decode_features(mm).collect()
        assert len(feats) == 5
        f = {r["doc_id"]: r for r in feats}
        assert len(f[1]["feature"]) == 8
        assert f[1]["sha256"] == f[2]["sha256"]  # same payload → same digest
        frames = frame_sample(mm, n_frames=3).collect()
        assert all(r["frame_idx"] < 3 for r in frames)

    def test_strict_mode_raises(self, docs):
        from py4j.protocol import Py4JJavaError

        from qlbridge_spark.datapipe.multimodal import attach_fake_payload, decode_features

        mm = attach_fake_payload(docs.limit(1), "doc_id", "text")
        with pytest.raises(Exception):
            decode_features(mm, strict=True).collect()


class TestConnectedComponents:
    def test_transitive_chain_resolved(self, spark):
        from qlbridge_spark.datapipe import connected_components

        pairs = spark.createDataFrame([(5, 2), (2, 9), (9, 7), (11, 12)], "id_a long, id_b long")
        comps = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
        assert comps[5] == comps[2] == comps[9] == comps[7] == 2
        assert comps[11] == comps[12] == 11

    def test_long_path_converges_via_pointer_jumping(self, spark):
        """A 60-edge path has diameter 60 ≫ the old per-round reach; the
        pointer-jumping shortcut must still converge (O(log d) rounds)
        inside the default max_iter — the round-6 verdict's under-merge
        hazard."""
        import warnings

        from qlbridge_spark.datapipe import connected_components

        n = 61
        pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # non-convergence warning = failure
            comps = {r["node"]: r["comp"] for r in connected_components(pairs, max_iter=10).collect()}
        assert len(comps) == n
        assert set(comps.values()) == {0}

    def test_nonconvergence_warns_not_silent(self, spark):
        # pins the DISTRIBUTED loop (small graphs resolve exactly on the
        # driver, where max_iter is irrelevant — force the loop via conf)
        import pytest as _pytest

        from qlbridge_spark.datapipe import connected_components

        pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
        spark.conf.set("qlbridge.cc.localThreshold", "0")
        try:
            with _pytest.warns(RuntimeWarning, match="did not converge"):
                connected_components(pairs, max_iter=1).collect()
        finally:
            spark.conf.unset("qlbridge.cc.localThreshold")

    def test_small_graph_local_path_matches_distributed(self, spark):
        # the threshold-gated driver union-find must return exactly the
        # distributed loop's (node, min-reachable-id) labels — and be
        # exact even at max_iter=1 (no iteration limit applies locally)
        import random

        from qlbridge_spark.datapipe import connected_components

        random.seed(13)
        edges = [(random.randint(0, 30), random.randint(0, 30)) for _ in range(60)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        local = sorted(map(tuple, connected_components(pairs, max_iter=1).collect()))
        spark.conf.set("qlbridge.cc.localThreshold", "0")
        try:
            dist = sorted(map(tuple, connected_components(pairs).collect()))
        finally:
            spark.conf.unset("qlbridge.cc.localThreshold")
        assert local == dist
        # path graph: every node labels to the global min
        chain = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
        out = dict(connected_components(chain, max_iter=1).collect())
        assert set(out.values()) == {0} and len(out) == 41

    def test_include_cycle_detection(self, spark):
        import pytest

        from qlbridge_spark import Engine, TranslateError

        eng = Engine(spark)
        eng.register_rows("cyc", [{"x": 1}])
        eng.register_include("a", "x > 0")
        eng.includes["a"] = __import__("qlbridge_spark").parse_expression("x > 0 AND INCLUDE b")
        eng.includes["b"] = __import__("qlbridge_spark").parse_expression("INCLUDE a")
        with pytest.raises(TranslateError, match="cycle"):
            eng.execute("FILTER INCLUDE a FROM cyc").count()
        eng.execute("DROP TABLE cyc")


class TestRound2Additions:
    def test_lsh_jaccard_pairs_exact_verify(self, docs):
        """LSH candidates + exact Jaccard verify equals the exhaustive
        exact pair set on the fixture."""
        from qlbridge_spark.datapipe import lsh_jaccard_pairs

        pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in lsh_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup
        assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0  # near dup
        assert not any({a, b} & {4, 5} and {a, b} != {4, 5} for a, b in pairs)

    def test_simhash_portable_matches_semantics(self, spark):
        """portable=True (md5 bits) finds the same near-dup structure as the
        xxhash64 default: exact dups at hamming 0, unrelated docs far."""
        import random

        rnd = random.Random(5)
        vocab = [f"w{i}" for i in range(400)]
        base = [rnd.choice(vocab) for _ in range(400)]
        edit = list(base)
        edit[7] = "changed"
        other = [rnd.choice(vocab) for _ in range(400)]
        df = spark.createDataFrame(
            [(1, " ".join(base)), (2, " ".join(base)), (3, " ".join(edit)), (4, " ".join(other))],
            "doc_id long, text string",
        )
        from qlbridge_spark.datapipe import simhash_pairs

        pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(df, "doc_id", "text", max_hamming=8, portable=True).collect()}
        assert pairs[(1, 2)] == 0
        assert (1, 3) in pairs and pairs[(1, 3)] <= 8
        assert not any(4 in (a, b) for a, b in pairs)

    def test_ivf_build_no_global_window(self, spark):
        """Centroid selection must lower to TakeOrderedAndProject — never a
        single-partition window over the whole corpus (the 100 TB killer)."""
        import random

        from qlbridge_spark.datapipe import ivf_build

        rnd = random.Random(1)
        df = spark.createDataFrame(
            [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(100)],
            "vec_id long, embedding array<double>",
        )
        for method in ("hash", "min_id"):
            assigned, cents = ivf_build(df, n_cells=4, method=method)
            plan = cents._jdf.queryExecution().executedPlan().toString()
            assert "TakeOrderedAndProject" in plan, plan
            assert "Window" not in plan, plan
            assert cents.count() == 4
        # cell ids are the centroids' own vec_ids under min_id
        assert sorted(r["cell_id"] for r in cents.collect()) == [0, 1, 2, 3]

    def test_lsh_band_hash_no_string_churn(self, spark):
        """The band-key expression hashes the long slices directly — no
        concat_ws/cast-to-string materialization in the plan."""
        from qlbridge_spark.datapipe import lsh_candidate_pairs, minhash_signature

        df = spark.createDataFrame([(1, "a b c d e f g"), (2, "a b c d e f g")], "doc_id long, text string")
        sigs = minhash_signature(df, "text", num_hashes=8, shingle_size=2, id_col="doc_id")
        pairs = lsh_candidate_pairs(sigs, "doc_id", "minhash", bands=4)
        plan = pairs._jdf.queryExecution().analyzed().toString()
        assert "concat_ws" not in plan
        assert pairs.collect() == [(1, 2)] or [(r["id_a"], r["id_b"]) for r in pairs.collect()] == [(1, 2)]


class TestAsofJoin:
    """asof_join (datapipe/asof.py): the union + last-value-window
    formulation — semantics checked against hand-computed expectations,
    plan checked for the single-shuffle shape."""

    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "u1", 100), (2, "u1", 205), (3, "u2", 150), (4, "u3", 50)],
            "eid long, uid string, t long",
        ).withColumn("t", F.timestamp_micros(F.col("t") * 1000000))
        right = spark.createDataFrame(
            [("u1", 90, 901), ("u1", 205, 902), ("u1", 300, 903), ("u2", 160, 904)],
            "uid string, t long, rid long",
        ).withColumn("t", F.timestamp_micros(F.col("t") * 1000000))
        return left, right

    def test_backward_semantics(self, spark):
        from qlbridge_spark.datapipe import asof_join

        left, right = self._frames(spark)
        out = asof_join(left, right, on="t", by="uid", tiebreak="rid")
        got = {r["eid"]: r["rid"] for r in out.collect()}
        # eid1@100 → rid901@90; eid2@205 → rid902@205 (equal ts matches);
        # eid3(u2)@150 → no prior (904 is at 160); eid4(u3) → no right rows
        assert got == {1: 901, 2: 902, 3: None, 4: None}

    def test_forward_semantics(self, spark):
        from qlbridge_spark.datapipe import asof_join

        left, right = self._frames(spark)
        out = asof_join(left, right, on="t", by="uid", direction="forward", tiebreak="rid")
        got = {r["eid"]: r["rid"] for r in out.collect()}
        assert got == {1: 902, 2: 902, 3: 904, 4: None}

    def test_tolerance(self, spark):
        from qlbridge_spark.datapipe import asof_join

        left, right = self._frames(spark)
        out = asof_join(left, right, on="t", by="uid", tolerance_seconds=5, tiebreak="rid")
        got = {r["eid"]: r["rid"] for r in out.collect()}
        # only eid2 has a match within 5s (exact-ts); eid1's is 10s stale
        assert got == {1: None, 2: 902, 3: None, 4: None}

    def test_single_shuffle_plan(self, spark):
        from qlbridge_spark.datapipe import asof_join

        left, right = self._frames(spark)
        out = asof_join(left, right, on="t", by="uid", tiebreak="rid")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # one hashpartitioning exchange on the key, no join operator at all
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


class TestHashSample:
    def test_deterministic_and_stratified(self, spark):
        from qlbridge_spark.datapipe import hash_sample

        df = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)], "id long, lang string"
        )
        s1 = sorted(r["id"] for r in hash_sample(df, "id", {"en": 0.25}, strata_col="lang", salt="s").collect())
        s2 = sorted(r["id"] for r in hash_sample(df, "id", {"en": 0.25}, strata_col="lang", salt="s").collect())
        assert s1 == s2  # rerun-identical
        en = sum(1 for i in s1 if i % 2 == 0)
        fr = sum(1 for i in s1 if i % 2 == 1)
        assert fr == 1000  # default rate 1.0 keeps every fr doc
        assert 150 < en < 350  # ~25% of 1000
        # different salt → different subset
        s3 = sorted(r["id"] for r in hash_sample(df, "id", {"en": 0.25}, strata_col="lang", salt="t").collect())
        assert s1 != s3

    def test_flat_rate_and_validation(self, spark):
        import pytest as _pytest

        from qlbridge_spark.datapipe import hash_sample
        from qlbridge_spark.datapipe.sampling import rate_threshold_hex

        df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
        n = hash_sample(df, "id", 0.5, salt="x").count()
        assert 400 < n < 600
        assert rate_threshold_hex(0.5) == "80000000"
        with _pytest.raises(ValueError):
            rate_threshold_hex(1.5)
        with _pytest.raises(ValueError):
            hash_sample(df, "id", {"en": 0.5})  # rate map needs strata_col

    def test_no_shuffle(self, spark):
        from qlbridge_spark.datapipe import hash_sample

        df = spark.createDataFrame([(i, "en") for i in range(100)], "id long, lang string")
        plan = hash_sample(df, "id", 0.5)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestTfidf:
    def test_top_terms_hand_checked(self, spark):
        from qlbridge_spark.datapipe import tfidf_top_terms

        df = spark.createDataFrame(
            [
                (1, "apple apple banana common"),
                (2, "banana cherry common"),
                (3, "cherry common common"),
            ],
            "doc_id long, text string",
        )
        out = tfidf_top_terms(df, "doc_id", "text", k=2)
        rows = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"]) for r in out.collect()}
        # doc1: apple tf=2 df=1 score=2*3000; banana tf=1 df=2 score=1500
        assert rows[(1, 1)] == ("apple", 2, 1)
        assert rows[(1, 2)] == ("banana", 1, 2)
        # doc3: common tf=2 df=3 score=2*1000=2000 beats cherry 1*1500
        assert rows[(3, 1)] == ("common", 2, 3)
        assert rows[(3, 2)] == ("cherry", 1, 2)


class TestSkewOperators:
    """Salting patterns (datapipe/skew.py): output-identical to the naive
    join/groupBy, hot keys spread across salt buckets."""

    def _skewed(self, spark):
        # 10k rows of hot key "h" + 100 distinct cold keys
        from pyspark.sql import functions as F2

        hot = spark.range(2000).select(F2.lit("h").alias("k"), F2.col("id").alias("v"))
        cold = spark.range(100).select(F2.concat(F2.lit("c"), F2.col("id")).alias("k"), F2.col("id").alias("v"))
        return hot.unionAll(cold)

    def test_salted_join_matches_plain_join(self, spark):
        from qlbridge_spark.datapipe import salted_join

        big = self._skewed(spark)
        other = spark.createDataFrame(
            [("h", "HOT"), ("c1", "C1"), ("c2", "C2")], "k string, label string"
        )
        plain = big.join(other, "k").groupBy("k", "label").count()
        salted = salted_join(big, other, "k").groupBy("k", "label").count()
        assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    def test_salted_left_join_keeps_unmatched(self, spark):
        from qlbridge_spark.datapipe import salted_join

        big = self._skewed(spark)
        other = spark.createDataFrame([("h", "HOT")], "k string, label string")
        out = salted_join(big, other, "k", how="left")
        assert out.count() == big.count()
        assert out.filter("label IS NULL").count() == 100  # all cold rows

    def test_salt_spreads_hot_key(self, spark):
        from pyspark.sql import functions as F2

        from qlbridge_spark.datapipe import salted_join

        big = self._skewed(spark)
        other = spark.createDataFrame([("h", "HOT")], "k string, label string")
        # peek at the salted key distribution through the same salt expr
        salts = 8
        salted = big.withColumn("__salt", F2.pmod(F2.xxhash64(*[F2.col(c) for c in big.columns]), F2.lit(salts)))
        dist = salted.filter("k = 'h'").groupBy("__salt").count().collect()
        assert len(dist) == salts  # hot key present in every salt bucket
        assert max(r["count"] for r in dist) < 2000  # no bucket holds it all
        assert salted_join(big, other, "k").count() == 2000

    def test_two_phase_agg_matches_plain(self, spark):
        from pyspark.sql import functions as F2

        from qlbridge_spark.datapipe import two_phase_agg

        df = self._skewed(spark)
        plain = df.groupBy("k").agg(F2.sum("v").alias("s"), F2.count(F2.lit(1)).alias("n"), F2.max("v").alias("mx"))
        two = two_phase_agg(
            df,
            "k",
            partial_aggs={"s": F2.sum("v"), "n": F2.count(F2.lit(1)), "mx": F2.max("v")},
            final_aggs={"s": F2.sum("s"), "n": F2.sum("n"), "mx": F2.max("mx")},
        )
        assert sorted(map(tuple, two.collect())) == sorted(map(tuple, plain.collect()))

    def test_two_phase_agg_salt_on_distinct_column_exact(self, spark):
        """salt_on=<distinct col> partitions equal values into one salt
        bucket, so per-salt count_distinct sums EXACTLY (whole-row salt
        would double-count values straddling buckets)."""
        from pyspark.sql import functions as F2

        from qlbridge_spark.datapipe import two_phase_agg

        df = self._skewed(spark).withColumn("g", (F2.col("v") % 7).cast("long"))
        plain = df.groupBy("k").agg(F2.count_distinct("g").alias("nd"))
        two = two_phase_agg(
            df,
            "k",
            partial_aggs={"nd": F2.count_distinct("g")},
            final_aggs={"nd": F2.sum("nd")},
            salts=8,
            salt_on="g",
        )
        assert sorted(map(tuple, two.collect())) == sorted(map(tuple, plain.collect()))

    def test_skew_stats_top_keys(self, spark):
        from qlbridge_spark.datapipe import skew_stats

        df = self._skewed(spark)
        top = skew_stats(df, "k", top=3).collect()
        assert top[0]["k"] == "h" and top[0]["n_rows"] == 2000
        plan = skew_stats(df, "k", top=3)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestMinhashSigCol:
    def test_row_expression_equals_batch_aggregation(self, spark, docs):
        """minhash_sig_col (streaming per-row expression) must produce the
        SAME signatures as the batch explode+min-agg path."""
        from qlbridge_spark.datapipe.dedup import _minhash_sigs, minhash_sig_col

        d = docs.filter("text != ''")
        batch = {r["__id"]: list(r["minhash"]) for r in _minhash_sigs(d, "doc_id", "text", 16, 3).collect()}
        row = {
            r["doc_id"]: list(r["sig"])
            for r in d.select("doc_id", minhash_sig_col(F.col("text"), 16, 3).alias("sig")).collect()
        }
        assert batch == row


class TestIvfKmeansRefine:
    def test_refined_centroids_improve_recall_on_clustered_data(self, spark):
        """3 Lloyd iterations on clustered data: refined-centroid recall
        must be >= the random-centroid recall (and both indexes stay
        plan-hygienic: no global window)."""
        import random

        from qlbridge_spark.datapipe import cosine_topk, ivf_build, ivf_topk

        rnd = random.Random(7)
        centers = [[rnd.gauss(0, 5) for _ in range(8)] for _ in range(6)]
        rows = []
        for i in range(240):
            ctr = centers[i % 6]
            rows.append((i, [x + rnd.gauss(0, 0.3) for x in ctr]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = df.filter(F.col("vec_id") < 4)
        exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(df, q, k=5).collect()}

        def recall(refine_iters):
            assigned, cents = ivf_build(df, n_cells=6, method="hash", refine_iters=refine_iters)
            assert cents.count() == 6
            approx = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(assigned, cents, q, k=5, nprobe=2).collect()}
            return len(exact & approx) / len(exact)

        r0, r3 = recall(0), recall(3)
        assert r3 >= r0
        assert r3 >= 0.8  # refined centroids ≈ true cluster centers → high recall

    def test_empty_cell_keeps_previous_centroid(self, spark):
        from qlbridge_spark.datapipe import ivf_build

        # 2 tight clusters, 4 cells → ≥2 cells starve during refinement
        rows = [(i, [float(i % 2) * 10 + 1.0, 1.0]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        assigned, cents = ivf_build(df, n_cells=4, method="min_id", refine_iters=2)
        assert cents.count() == 4  # no cell silently dropped
        assert assigned.count() == 40


class TestSampleRateOne:
    def test_rate_one_keeps_every_row(self, spark):
        from qlbridge_spark.datapipe import hash_sample
        from qlbridge_spark.datapipe.sampling import rate_threshold_hex

        assert rate_threshold_hex(1.0) == "g"  # sorts above every hex prefix
        df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
        assert hash_sample(df, "id", 1.0, salt="any").count() == 5000


class TestPrefixJaccard:
    def test_recall_lossless_vs_exhaustive(self, docs):
        """Prefix filtering must return EXACTLY the exhaustive exact-Jaccard
        pair set (PPJoin guarantee) — compared against the capless
        inverted-index join on the same fixture."""
        from qlbridge_spark.datapipe import ngram_jaccard_pairs, prefix_jaccard_pairs

        d = docs.filter("text != ''")
        exhaustive = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3, df_cap=10**9).collect()
        }
        prefixed = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in prefix_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3).collect()
        }
        assert prefixed == exhaustive
        assert (1, 2) in prefixed and prefixed[(1, 2)] == 1.0

    def test_high_threshold_small_prefix(self, spark):
        # at t=0.9 only ~10% of each doc is indexed, yet exact dups found
        from qlbridge_spark.datapipe import prefix_jaccard_pairs

        df = spark.createDataFrame(
            [(i, "tok" + " tok".join(str((i * 31 + j) % 97) for j in range(40))) for i in range(30)]
            + [(100, "tok" + " tok".join(str(j) for j in range(40))), (101, "tok" + " tok".join(str(j) for j in range(40)))],
            "doc_id long, text string",
        )
        pairs = {(r["id_a"], r["id_b"]) for r in prefix_jaccard_pairs(df, "doc_id", "text", threshold=0.9).collect()}
        assert (100, 101) in pairs


class TestLshProductionRecall:
    """Recall-vs-cost evidence for the PRODUCTION LSH configuration.

    dp07 ships the oracle-gated lossless config (bands=num_hashes, r=1 —
    a 0.89-Jaccard pair misses with prob (1-j)^32 ≈ 2e-31). At 100 TB you
    run fewer, wider bands to cut candidate volume; this pins the measured
    recall of bands=8, r=2 (16 hashes) against the exact pair set on the
    real testdata documents: P(candidate | j) = 1-(1-j²)^8, which at the
    corpus's weakest true pair (j≈0.889) is 1-3.8e-6."""

    SF_DIR = "/root/testdata/sf0.001"

    def test_bands8_r2_recall_ge_99(self, spark):
        import os

        if not os.path.isdir(self.SF_DIR.rsplit("/", 1)[0]):
            pytest.skip("testdata not present")
        from qlbridge_spark.datapipe import lsh_jaccard_pairs, release_caches

        docs = spark.read.parquet(self.SF_DIR + "/documents.parquet")
        exact = {
            (r["id_a"], r["id_b"])
            for r in lsh_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, num_hashes=32, bands=32).collect()
        }
        release_caches()
        cheap = {
            (r["id_a"], r["id_b"])
            for r in lsh_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, num_hashes=16, bands=8).collect()
        }
        release_caches()
        assert len(exact) > 0
        recall = len(cheap & exact) / len(exact)
        # measured 1.0 at sf0.001 (28/28 pairs) — gate at the 0.99 target
        assert recall >= 0.99, f"recall {recall:.4f} < 0.99 ({len(cheap & exact)}/{len(exact)})"

    def test_bands8_r2_candidate_cost_lower(self, spark):
        """The point of r=2: banding rows AND candidate pairs shrink —
        band hashes collide only when BOTH rows of the band agree."""
        import os

        if not os.path.isdir(self.SF_DIR):
            pytest.skip("testdata not present")
        from qlbridge_spark.datapipe.dedup import lsh_candidate_pairs, minhash_signature
        from qlbridge_spark.datapipe import release_caches

        docs = spark.read.parquet(self.SF_DIR + "/documents.parquet")
        sigs32 = minhash_signature(docs, "text", num_hashes=32, id_col="doc_id")
        cands_lossless = lsh_candidate_pairs(sigs32, "doc_id", "minhash", bands=32, sig_len=32).count()
        sigs16 = minhash_signature(docs, "text", num_hashes=16, id_col="doc_id")
        cands_cheap = lsh_candidate_pairs(sigs16, "doc_id", "minhash", bands=8, sig_len=16).count()
        release_caches()
        assert cands_cheap <= cands_lossless


class TestChunkDocuments:
    """Token-window chunking (chunk_documents): zero-shuffle posexplode,
    last-chunk-short layout, overlap stitching. DuckDB replica gates the
    same arithmetic in dp03."""

    def _chunks(self, spark, rows, **kw):
        from qlbridge_spark.datapipe import chunk_documents

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
            for r in chunk_documents(df, "doc_id", "text", **kw).collect()
        }

    def test_layout_and_overlap(self, spark):
        text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
        got = self._chunks(spark, [(1, text)], chunk_tokens=4, overlap=1)
        # stride 3, ceil((10-1)/3) = 3 chunks: starts 0,3,6 — the last
        # chunk [t6..t9] already covers the tail, no degenerate 4th
        assert got[(1, 0)] == (4, "t0 t1 t2 t3")
        assert got[(1, 1)] == (4, "t3 t4 t5 t6")
        assert got[(1, 2)] == (4, "t6 t7 t8 t9")
        assert len(got) == 3

    def test_short_doc_single_chunk(self, spark):
        got = self._chunks(spark, [(1, "a b")], chunk_tokens=32, overlap=8)
        assert got == {(1, 0): (2, "a b")}

    def test_exact_boundary_no_empty_tail(self, spark):
        text = " ".join(f"t{i}" for i in range(4))
        got = self._chunks(spark, [(1, text)], chunk_tokens=4, overlap=1)
        assert len(got) == 1  # 4 tokens fit one 4-token chunk exactly

    def test_empty_docs_dropped(self, spark):
        got = self._chunks(spark, [(1, "  "), (2, "x")], chunk_tokens=4, overlap=1)
        assert set(k[0] for k in got) == {2}

    def test_overlap_ge_chunk_errors(self, spark):
        from qlbridge_spark.datapipe import chunk_documents

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)

    def test_no_shuffle_plan(self, spark):
        from qlbridge_spark.datapipe import chunk_documents

        df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
        plan = chunk_documents(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestCapPerGroup:
    def test_caps_and_is_deterministic(self, spark):
        from qlbridge_spark.datapipe import cap_per_group

        df = spark.createDataFrame([(i, "g%d" % (i % 3)) for i in range(60)], "id long, g string")
        out = cap_per_group(df, "g", 5, key_col="id", salt="s1")
        counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"g0": 5, "g1": 5, "g2": 5}
        again = cap_per_group(df, "g", 5, key_col="id", salt="s1")
        assert sorted(r["id"] for r in out.collect()) == sorted(r["id"] for r in again.collect())

    def test_small_groups_kept_whole(self, spark):
        from qlbridge_spark.datapipe import cap_per_group

        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, g string")
        assert cap_per_group(df, "g", 10, key_col="id").count() == 3

    def test_order_by_priority(self, spark):
        from qlbridge_spark.datapipe import cap_per_group

        df = spark.createDataFrame([(1, "a", 0.9), (2, "a", 0.5), (3, "a", 0.7)], "id long, g string, q double")
        kept = sorted(r["id"] for r in cap_per_group(df, "g", 2, order_by=[F.col("q").desc()]).collect())
        assert kept == [1, 3]  # best-quality two

    def test_requires_ordering(self, spark):
        from qlbridge_spark.datapipe import cap_per_group

        df = spark.createDataFrame([(1, "a")], "id long, g string")
        with pytest.raises(ValueError, match="order_by or key_col"):
            cap_per_group(df, "g", 1)


class TestScrubText:
    def test_redacts_email_url_ip(self, spark):
        from qlbridge_spark.datapipe import scrub_text

        df = spark.createDataFrame(
            [("contact bob@example.com or https://ex.com/a?b=1 from 10.0.0.1 today",)], "text string"
        )
        out = df.select(scrub_text(F.col("text")).alias("t")).collect()[0]["t"]
        assert out == "contact <EMAIL> or <URL> from <IP> today"

    def test_phone_opt_in(self, spark):
        from qlbridge_spark.datapipe import scrub_text

        df = spark.createDataFrame([("call +1 (415) 555-0199 now",)], "text string")
        kept = df.select(scrub_text(F.col("text")).alias("t")).collect()[0]["t"]
        assert "555" in kept  # phone not scrubbed by default
        got = df.select(scrub_text(F.col("text"), ("email", "url", "ipv4", "phone")).alias("t")).collect()[0]["t"]
        assert got == "call <PHONE> now"

    def test_stats_map(self, spark):
        from qlbridge_spark.datapipe import scrub_stats

        df = spark.createDataFrame([("a@b.co c@d.io http://x.io 8.8.8.8 plain",)], "text string")
        m = df.select(scrub_stats(F.col("text")).alias("m")).collect()[0]["m"]
        assert m == {"email": 2, "url": 1, "ipv4": 1}

    def test_no_python_in_plan(self, spark):
        from qlbridge_spark.datapipe import scrub_stats, scrub_text

        df = spark.createDataFrame([("x",)], "text string")
        plan = (
            df.select(scrub_text(F.col("text")), scrub_stats(F.col("text")))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "Exchange" not in plan

    def test_unknown_kind_errors(self, spark):
        from qlbridge_spark.datapipe import scrub_text

        with pytest.raises(ValueError, match="unknown scrub kind"):
            scrub_text(F.lit("x"), ("ssn",))


class TestDecontaminate:
    def test_overlapping_docs_dropped(self, spark):
        from qlbridge_spark.datapipe import decontaminate

        corpus = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six seven"),   # contains bench 4-gram
                (3, "totally unrelated words here again now"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame([(100, "zzz one two three four qqq")], "doc_id long, text string")
        kept = sorted(r["doc_id"] for r in decontaminate(corpus, bench, "doc_id", "text", n=4).collect())
        assert kept == [1, 3]

    def test_no_overlap_keeps_all(self, spark):
        from qlbridge_spark.datapipe import decontaminate

        corpus = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
        bench = spark.createDataFrame([(9, "v w x y z")], "doc_id long, text string")
        assert decontaminate(corpus, bench, "doc_id", "text", n=3).count() == 1

    def test_benchmark_broadcast_plan(self, spark):
        from qlbridge_spark.datapipe import decontaminate

        corpus = spark.createDataFrame([(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)], "doc_id long, text string")
        bench = corpus.limit(2)
        plan = decontaminate(corpus, bench, "doc_id", "text", n=3)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan


class TestPackSequences:
    def test_bins_fill_and_never_split_chunks(self, spark):
        from qlbridge_spark.datapipe import pack_sequences

        rows = [(d, i, 30) for d in range(4) for i in range(5)]  # 20 chunks x 30 tokens
        df = spark.createDataFrame(rows, "doc_id long, chunk_idx long, n_tok long")
        out = pack_sequences(df, ["doc_id", "chunk_idx"], "n_tok", window_tokens=100, buckets=1).collect()
        by_bin = {}
        for r in out:
            by_bin.setdefault(r["pack_bin"], []).append(r["n_tok"])
        # 600 tokens / 100-token windows → 6 bins; each bin ≤ 100 + one chunk
        assert len(by_bin) == 6
        for b, toks in by_bin.items():
            assert sum(toks) <= 100 + 30

    def test_deterministic_across_runs(self, spark):
        from qlbridge_spark.datapipe import pack_sequences

        rows = [(d, 0, 10 + d % 7) for d in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, chunk_idx long, n_tok long")
        a = {(r["doc_id"]): (r["pack_bucket"], r["pack_bin"]) for r in pack_sequences(df, ["doc_id", "chunk_idx"], "n_tok", 64, buckets=8, salt="s").collect()}
        b = {(r["doc_id"]): (r["pack_bucket"], r["pack_bin"]) for r in pack_sequences(df, ["doc_id", "chunk_idx"], "n_tok", 64, buckets=8, salt="s").collect()}
        assert a == b

    def test_single_shuffle_plan(self, spark):
        from qlbridge_spark.datapipe import pack_sequences

        df = spark.createDataFrame([(1, 0, 5)], "doc_id long, chunk_idx long, n_tok long")
        plan = pack_sequences(df, ["doc_id", "chunk_idx"], "n_tok")._jdf.queryExecution().executedPlan().toString()
        # both windows share the pack_bucket partitioning: one Exchange
        assert plan.count("Exchange") == 1 and "BatchEvalPython" not in plan


class TestNgramRepetition:
    def test_top_bigram_coverage(self, spark):
        from qlbridge_spark.datapipe import ngram_repetition

        df = spark.createDataFrame(
            [
                (1, "spam spam spam spam"),          # "spam spam" ×3 of 3 bigrams
                (2, "a b c d e"),                     # all bigrams unique
                (3, "x"),                             # < 2 tokens
                (4, ""),                              # empty
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in ngram_repetition(df, "doc_id", "text", n=2).collect()}
        assert out[1]["top_ngram"] == "spam spam" and out[1]["top_n"] == 3 and out[1]["total_n"] == 3
        assert out[1]["top_frac"] == 1.0
        assert out[2]["top_n"] == 1 and out[2]["total_n"] == 4 and out[2]["top_frac"] == 0.25
        assert out[3]["top_n"] == 0 and out[3]["top_frac"] is None
        assert out[4]["top_n"] == 0 and out[4]["top_frac"] is None

    def test_counts_occurrences_not_distinct(self, spark):
        from qlbridge_spark.datapipe import ngram_repetition

        df = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
        r = ngram_repetition(df, "doc_id", "text", n=2).collect()[0]
        # bigrams: "a b","b a","a b","b a" → top 2 of 4
        assert r["top_n"] == 2 and r["total_n"] == 4 and r["top_frac"] == 0.5

    def test_no_python_in_plan(self, spark):
        from qlbridge_spark.datapipe import ngram_repetition

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = ngram_repetition(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan

    def test_zero_exchange_plan_and_tiebreak(self, spark):
        # r17: the top n-gram is a row-local mode (sorted-run fold) — the
        # plan must carry NO shuffle, and count ties must break to the
        # lexicographically LARGEST gram, matching the r16 shape's
        # max_by(g, struct(count, g)) exactly.
        from qlbridge_spark.datapipe import ngram_repetition

        df = spark.createDataFrame(
            [(1, "a b c a b c"), (2, "z z q q")], "doc_id long, text string"
        )
        q = ngram_repetition(df, "doc_id", "text", n=2)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        out = {r["doc_id"]: r for r in q.collect()}
        # doc 1: "a b"×2 and "b c"×2 tie — max_by picks the larger string
        assert out[1]["top_ngram"] == "b c" and out[1]["top_n"] == 2 and out[1]["total_n"] == 5
        # doc 2: all three bigrams count 1 — "z z" is the largest
        assert out[2]["top_ngram"] == "z z" and out[2]["top_n"] == 1 and out[2]["total_n"] == 3


class TestMixCorpora:
    """epoch_sample / mix_corpora — deterministic training-mixture
    construction (fractional-epoch up/downsampling, zero shuffles)."""

    def test_epoch_sample_whole_and_fraction(self, spark):
        from qlbridge_spark.datapipe.sampling import epoch_sample

        df = spark.range(2000).toDF("id")
        out = epoch_sample(df, "id", 2.5, salt="t")
        n = out.count()
        assert 2000 * 2 + 800 < n < 2000 * 2 + 1200  # ~2.5 epochs
        # copies tagged 0/1, fraction tagged 2
        tags = {r["__epoch"] for r in out.select("__epoch").distinct().collect()}
        assert tags == {0, 1, 2}

    def test_epoch_sample_deterministic(self, spark):
        from qlbridge_spark.datapipe.sampling import epoch_sample

        df = spark.range(500).toDF("id")
        a = sorted(r.id for r in epoch_sample(df, "id", 0.3, salt="x").collect())
        b = sorted(r.id for r in epoch_sample(df, "id", 0.3, salt="x").collect())
        assert a == b and 80 < len(a) < 220

    def test_epoch_zero(self, spark):
        from qlbridge_spark.datapipe.sampling import epoch_sample

        assert epoch_sample(spark.range(10).toDF("id"), "id", 0.0).count() == 0

    def test_mix_corpora_weights_and_tags(self, spark):
        from qlbridge_spark.datapipe.sampling import mix_corpora

        a = spark.range(1000).toDF("id")
        b = spark.range(500).toDF("id")
        m = mix_corpora({"wiki": (a, 2.0), "cc": (b, 0.4)}, "id", salt="mx")
        counts = {r["__source"]: r["count"] for r in m.groupBy("__source").count().collect()}
        assert counts["wiki"] == 2000 and 120 < counts["cc"] < 280

    def test_mix_no_shuffle(self, spark):
        from qlbridge_spark.datapipe.sampling import mix_corpora

        a = spark.range(100).toDF("id")
        m = mix_corpora({"a": (a, 1.5), "b": (a, 0.5)}, "id")
        assert m._jdf.queryExecution().executedPlan().toString().count("Exchange") == 0


class TestJsonlExport:
    def test_roundtrip(self, spark, tmp_path):
        from qlbridge_spark.datapipe.text import export_jsonl, read_jsonl

        df = spark.createDataFrame([(1, "hello"), (2, "world")], "id long, text string")
        out = str(tmp_path / "out_jsonl")
        export_jsonl(df, out)
        back = read_jsonl(spark, out)
        assert {(r.id, r.text) for r in back.collect()} == {(1, "hello"), (2, "world")}
        # raw lines are compact JSON objects
        lines = {r.value for r in spark.read.text(out).collect()}
        assert '{"id":1,"text":"hello"}' in lines
