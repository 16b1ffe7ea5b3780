"""Property-based tests (SURVEY §5.4) — hypothesis drives the invariants
the reference only implies.

Driver-side properties (synonym normalization) run with full example
budgets; Spark-backed properties use small budgets and tiny frames so
each example is one fast local job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from codex_data_products_spark.functions.antibodies import (
    ANTIBODY_SYNONYMS,
    canonical_channel,
    canonical_channel_py,
)

SPARK_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# --- synonym normalization (J4): pure driver-side, full budget ------------

name_strategy = st.one_of(
    st.sampled_from(
        [syn for v in ANTIBODY_SYNONYMS.values() for syn in v]
        + list(ANTIBODY_SYNONYMS)
    ),
    st.text(min_size=0, max_size=12),
)


@given(name_strategy)
def test_canonicalization_is_idempotent(name):
    once = canonical_channel_py(name)
    assert canonical_channel_py(once) in (once, canonical_channel_py(once))
    # canonical keys are fixed points unless they are another key's synonym
    for canonical in ANTIBODY_SYNONYMS:
        mapped = canonical_channel_py(canonical)
        all_syns = {
            s.strip().lower()
            for v in ANTIBODY_SYNONYMS.values()
            for s in v
        }
        if canonical.strip().lower() not in all_syns:
            assert mapped == canonical


@given(st.lists(name_strategy, min_size=1, max_size=6, unique=True))
@settings(**SPARK_SETTINGS)
def test_column_and_python_normalization_agree(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r["name"]: r["canon"]
        for r in df.select(
            "name", canonical_channel("name").alias("canon")
        ).collect()
    }
    assert got == {n: canonical_channel_py(n) for n in names}


# --- union-by-name (U1): commutative up to row order ----------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("abcd")),
        min_size=0,
        max_size=8,
    ),
    st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("cdef")),
        min_size=0,
        max_size=8,
    ),
)
@settings(**SPARK_SETTINGS)
def test_union_by_name_commutes(spark, rows_a, rows_b):
    a = spark.createDataFrame(rows_a, "cell_id int, channel string") if rows_a else None
    b = spark.createDataFrame(rows_b, "cell_id int, channel string") if rows_b else None
    if a is None or b is None:
        return
    ab = sorted(map(tuple, a.unionByName(b).collect()))
    ba = sorted(map(tuple, b.unionByName(a).collect()))
    assert ab == ba


# --- adjacency remap (W1/J3): edge survives iff both endpoints kept -------


@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(1, 6)),
        min_size=0,
        max_size=10,
    ),
    st.sets(st.integers(1, 6)),
)
@settings(**SPARK_SETTINGS)
def test_edge_filter_keeps_iff_both_endpoints(spark, edge_pos, kept_pos):
    from codex_data_products_spark.sources.labels import (
        remap_edges_to_cell_ids,
    )

    n = 6
    labels = spark.createDataFrame(
        [(p, f"cell-{p}") for p in range(1, n + 1)], "pos int, cell_id string"
    )
    if not edge_pos:
        return
    edges = spark.createDataFrame(
        [(i, j, 1.0) for i, j in edge_pos], "i int, j int, weight double"
    )
    keep = spark.createDataFrame(
        [(f"cell-{p}",) for p in sorted(kept_pos)], "cell_id string"
    ) if kept_pos else spark.createDataFrame([], "cell_id string")

    got = {
        (r["src_cell_id"], r["dst_cell_id"])
        for r in remap_edges_to_cell_ids(edges, labels, keep=keep).collect()
    }
    want = {
        (f"cell-{i}", f"cell-{j}")
        for i, j in edge_pos
        if i in kept_pos and j in kept_pos
    }
    assert got == want


# --- global cell id (E3): construction is injective ------------------------


@given(
    st.sets(
        st.tuples(
            st.sampled_from(["dsA", "dsB", "dsC"]),
            st.integers(1, 50).map(str),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SPARK_SETTINGS)
def test_global_cell_id_unique(spark, pairs):
    df = spark.createDataFrame(
        list(pairs), "dataset string, original_obs_id string"
    ).select(
        F.concat_ws("-", "dataset", "original_obs_id").alias("cell_id")
    )
    assert df.distinct().count() == len(pairs)


# --- pivot/unpivot (P1/P3): long → wide → long round-trips -----------------


@given(
    st.dictionaries(
        st.tuples(st.sampled_from("xy"), st.sampled_from(["c1", "c2", "c3"])),
        st.integers(0, 99),
        min_size=1,
        max_size=6,
    )
)
@settings(**SPARK_SETTINGS)
def test_pivot_roundtrip_property(spark, cells):
    long_rows = [(rid, ch, float(v)) for (rid, ch), v in cells.items()]
    long_df = spark.createDataFrame(long_rows, "rid string, ch string, v double")
    channels = sorted({ch for _, ch in cells})
    wide = long_df.groupBy("rid").pivot("ch", channels).agg(F.first("v"))
    back = {
        (r["rid"], ch): r[ch]
        for r in wide.collect()
        for ch in channels
        if r[ch] is not None
    }
    assert back == {(rid, ch): float(v) for (rid, ch), v in cells.items()}


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 500)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_assignment_invariants(spark, docs):
    """Prefix-sum packing: pack ids are contiguous from 0, every doc
    lands in exactly one pack, and a pack only overflows its capacity
    via its final (boundary-straddling) document."""
    from pyspark.sql import Window

    cap = 512
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    packed = df.withColumn(
        "pack_id", F.floor(start.cast("double") / cap).cast("long")
    ).collect()
    assert len(packed) == len(docs)
    ids = sorted({r["pack_id"] for r in packed})
    assert ids == list(range(len(ids)))  # contiguous from 0
    # each pack's *starting* offsets all lie inside its capacity window
    by_pack: dict[int, int] = {}
    total = 0
    for r in sorted(packed, key=lambda r: r["doc_id"]):
        assert r["pack_id"] == total // cap
        total += r["n_tokens"]
        by_pack[r["pack_id"]] = by_pack.get(r["pack_id"], 0) + 1
    assert sum(by_pack.values()) == len(docs)


@given(st.lists(st.integers(0, 5_000_000), min_size=1, max_size=200, unique=True))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hash_split_is_stable_and_partitions(spark, ids):
    """The doc_id hash split is a partition (every id in exactly one
    side) and membership is independent of row order/partitioning."""
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    split = F.when(
        (F.col("doc_id") * F.lit(2654435761)) % 4294967296 % 100 < 90, "train"
    ).otherwise("test")
    one = {r["doc_id"]: r["s"] for r in df.select("doc_id", split.alias("s")).collect()}
    two = {
        r["doc_id"]: r["s"]
        for r in df.repartition(7).select("doc_id", split.alias("s")).collect()
    }
    assert one == two
    assert set(one) == set(ids)


# --- MERGE semantics (operators.joins.merge_into) -------------------------

_base_rows = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.floats(min_value=0, max_value=100, allow_nan=False),
    min_size=1,
    max_size=6,
)
_changes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.sampled_from(["U", "I", "D"]),
        st.one_of(
            st.none(),
            st.floats(min_value=0, max_value=100, allow_nan=False),
        ),
    ),
    max_size=6,
    unique_by=lambda t: t[0],  # one change row per key (merge contract)
)


@given(_base_rows, _changes)
@settings(**SPARK_SETTINGS)
def test_merge_into_matches_reference_model(spark, base_rows, changes):
    """merge_into == the dict-semantics reference model: D removes,
    U/I with a value upserts, U/I with NULL keeps the existing value
    (or inserts the default)."""
    from codex_data_products_spark.operators.joins import merge_into

    base = spark.createDataFrame(
        [(k, v) for k, v in base_rows.items()], "k long, bal double"
    )
    ch = spark.createDataFrame(changes, "ck long, op string, nb double")

    model = dict(base_rows)
    for k, op, nb in changes:
        if op == "D":
            model.pop(k, None)
        elif k in model:
            if nb is not None:
                model[k] = nb
        else:  # insert path (matched 'I' above; unmatched here)
            model[k] = nb if nb is not None else -1.0

    got = {
        r["k"]: r["bal"]
        for r in merge_into(
            base,
            ch,
            key="k",
            change_key="ck",
            op_col="op",
            set_cols={"bal": "nb"},
            insert_defaults={"bal": F.lit(-1.0)},
        ).collect()
    }
    assert got == model


@given(st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=40))
def test_gini_tie_group_closed_form_equals_naive_rank_sum(counts):
    """skew_profile's Gini algebra: the tie-group closed form
    Σ cnt·(2·g·before + g(g+1)) over the distinct-count grain equals
    2·Σ rank·cnt over the naively sorted-and-ranked key list, for any
    count multiset — the identity that lets the query avoid ranking
    |keys| rows."""
    from collections import Counter

    srt = sorted(counts)
    naive_2s1 = 2 * sum((i + 1) * c for i, c in enumerate(srt))
    groups = sorted(Counter(counts).items())
    before = 0
    closed = 0
    for cnt, g in groups:
        closed += cnt * (2 * g * before + g * (g + 1))
        before += g
    assert closed == naive_2s1
    # and the resulting Gini matches the textbook formula
    n, s = len(srt), sum(srt)
    gini_closed = (closed - (n + 1) * s) / (n * s)
    gini_naive = (naive_2s1 - (n + 1) * s) / (n * s)
    assert gini_closed == gini_naive


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    st.sampled_from([2, 10, 100]),
)
def test_integer_rank_quantile_equals_sorted_pick(values, div):
    """The distinct-value cumulative trick (events_funnel_timing /
    text_length_percentiles): the smallest bucket whose cumulative
    count reaches n − n//div equals the ceil(q·n)-th element of the
    sorted list (q = 1 − 1/div), for any multiset."""
    from collections import Counter
    import math

    srt = sorted(values)
    n = len(srt)
    target = n - n // div
    # trick: walk distinct values in order, accumulate counts
    cum = 0
    picked = None
    for v, c in sorted(Counter(values).items()):
        cum += c
        if picked is None and cum >= target:
            picked = v
    q = 1 - 1 / div
    expected = srt[math.ceil(q * n) - 1]
    assert picked == expected


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=50,
    ),
    st.lists(st.integers(min_value=1, max_value=5), min_size=1, max_size=10),
)
def test_ewma_segmented_fold_equals_sequential(values, seg_sizes):
    """events_ewma's algebra: composing per-segment (scale, offset)
    linear maps in segment order equals the plain sequential fold over
    the full value list, for any segmentation — the identity that lets
    per-key aggregation state be O(segments) instead of O(events).

    The identity is exact in REAL arithmetic but not bit-for-bit in
    IEEE doubles (0.7·(0.7·x) reassociates to 0.49·x), which is why
    the registered query's DuckDB oracle replays the SEGMENTED
    arithmetic — cross-engine bit-identity comes from running the same
    op sequence, not from this algebraic identity. Here we assert the
    math with a tight relative tolerance."""
    # build segments covering the values list
    segs, i = [], 0
    for g in seg_sizes:
        if i >= len(values):
            break
        segs.append(values[i : i + g])
        i += g
    if i < len(values):
        segs.append(values[i:])
    flat = [v for s in segs for v in s]

    # sequential reference: first value seeds, then acc = 0.3v + 0.7acc
    acc = flat[0]
    for v in flat[1:]:
        acc = 0.3 * v + 0.7 * acc

    # segmented: per segment (s, o) composed map plus a seeded fold for
    # the first segment — exactly the query's arithmetic
    def seg_map(vals):
        s, o = 1.0, 0.0
        for v in vals:
            s, o = 0.7 * s, 0.3 * v + 0.7 * o
        return s, o

    def seg_seeded(vals):
        a = vals[0]
        for v in vals[1:]:
            a = 0.3 * v + 0.7 * a
        return a

    import math

    a = seg_seeded(segs[0])
    for seg in segs[1:]:
        s, o = seg_map(seg)
        a = s * a + o
    assert math.isclose(a, acc, rel_tol=1e-9, abs_tol=1e-9)


@given(st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=40))
def test_survival_suffix_sum_equals_direct_count(lifetimes):
    """orders_survival_curve's suffix-sum window: cumulative counts in
    descending value order equal the direct >= m counts at every
    distinct m."""
    from collections import Counter

    groups = sorted(Counter(lifetimes).items(), reverse=True)
    cum = 0
    suffix = {}
    for m, c in groups:
        cum += c
        suffix[m] = cum
    for m in suffix:
        assert suffix[m] == sum(1 for v in lifetimes if v >= m)


# --- incremental dedup == from-scratch (streaming/dedup_ivm.py) ------------
#
# The maintained duplicate-pair view must equal dedup_minhash_lsh
# recomputed over the union after EVERY batch, for random corpora drawn
# from a tiny vocabulary (maximizing shared shingles / band collisions)
# and random batch splits. Small example budget: each example runs a
# full multi-batch maintenance cycle with parquet state.

_DEDUP_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(_DEDUP_VOCAB), min_size=5, max_size=9
        ).map(" ".join),
        min_size=2,
        max_size=10,
    ),
    data=st.data(),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_incremental_equals_from_scratch(spark, tmp_path_factory, docs, data):
    from codex_data_products_spark.queries.dedup import (
        JACCARD_THRESHOLD,
        _frequent_shingles_removed,
        _jaccard_for_pairs,
        _lsh_candidate_pairs,
        shingle_table,
    )
    from codex_data_products_spark.streaming.dedup_ivm import (
        apply_dedup_batch,
        bootstrap_dedup_state,
        dedup_pairs_snapshot,
    )

    n_batches = data.draw(st.integers(min_value=1, max_value=3))
    assignment = [
        data.draw(st.integers(min_value=0, max_value=n_batches - 1))
        for _ in docs
    ]
    frame = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    state = str(tmp_path_factory.mktemp("dedup_ivm"))
    bootstrap_dedup_state(spark, state)
    seen_ids: list[int] = []
    for k in range(n_batches):
        ids = [i for i, b in zip(range(len(docs)), assignment) if b == k]
        seen_ids.extend(ids)
        batch = frame.filter(F.col("doc_id").isin(ids or [-1]))
        apply_dedup_batch(batch, state, k)
        prefix = frame.filter(F.col("doc_id").isin(seen_ids or [-1]))
        sh = _frequent_shingles_removed(shingle_table(prefix))
        want = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in _jaccard_for_pairs(_lsh_candidate_pairs(sh), sh)
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .collect()
        }
        got = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup_pairs_snapshot(spark, state).collect()
        }
        assert got == want


# --- prefix-filtered similarity join: exact-answer property --------------
#
# The WWW'07 guarantee: prefix + length filtering generates a candidate
# SUPERSET of all pairs with Jaccard >= t, and verification is exact —
# so the pipeline's output must EQUAL a brute-force Python model on the
# same corpora (no false negatives from filtering, no false positives
# from verification). Docs are a shared template with small deletions,
# which concentrates pairs right around the 0.95 boundary.

_TEMPLATE = [f"t{i}" for i in range(40)]


@given(
    st.lists(
        st.sets(st.integers(0, 39), max_size=2),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_jaccard_equals_exact_model(spark, removals):
    from codex_data_products_spark.queries.dedup import (
        _PREFIX_THRESHOLD,
        prefix_jaccard_frames,
    )

    sets = {
        i + 1: frozenset(
            t for j, t in enumerate(_TEMPLATE) if j not in rm
        )
        for i, rm in enumerate(removals)
    }
    expect = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            jac = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if jac >= _PREFIX_THRESHOLD:
                expect.add((a, b))
    frame = spark.createDataFrame(
        [(d, t) for d, items in sets.items() for t in sorted(items)],
        "doc_id long, item string",
    )
    _, _, _, verified = prefix_jaccard_frames(frame)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in verified.filter(
            F.col("jaccard") >= _PREFIX_THRESHOLD
        ).collect()
    }
    assert got == expect


# --- bounded k-core peel reaches the classical fixpoint ------------------


@given(
    st.sets(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kcore_peel_converges_to_classical_core(spark, edge_set):
    from codex_data_products_spark.operators.graphs import kcore_peel

    k = 2
    # classical fixpoint in Python
    edges = set(edge_set)
    while True:
        deg: dict[int, int] = {}
        for x, y in edges:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(x, y) for x, y in edges if x in keep and y in keep}
        if nxt == edges:
            break
        edges = nxt
    frame = spark.createDataFrame(sorted(edge_set), "x long, y long")
    # <= |V| rounds always converge; 6 nodes -> 6 rounds
    rounds = kcore_peel(frame, k, 6)
    sizes = [e.count() for _, e, _ in rounds]
    assert all(a >= b for a, b in zip(sizes, sizes[1:]))  # monotone
    final = {(r["x"], r["y"]) for r in rounds[-1][1].collect()}
    assert final == edges


# --- profile IVM: signed fold equals bootstrap on the net multiset -------


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", None]),
            st.integers(0, 3),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_profile_fold_equals_bootstrap_on_net_rows(spark, rows):
    """Insert all rows, then retract a deterministic half; the folded
    state must equal bootstrapping from only the surviving rows —
    including min/max, THE stats scalar state cannot maintain."""
    from codex_data_products_spark.streaming.merge import (
        bootstrap_profile_state,
        combine_profile_state,
        profile_rows,
        profile_stats,
    )

    schema = "status string, price long"
    base = spark.createDataFrame(rows, schema)
    state = bootstrap_profile_state(base, ["status", "price"])
    retracted = rows[::2]
    survivors = rows[1::2]
    if retracted:
        delta = profile_rows(
            spark.createDataFrame(
                [(s, p, -1) for s, p in retracted], schema + ", op int"
            ),
            ["status", "price"],
            "op",
        )
        state = combine_profile_state(state, delta)
    got = {tuple(r) for r in profile_stats(state).collect()}
    want = (
        {
            tuple(r)
            for r in profile_stats(
                bootstrap_profile_state(
                    spark.createDataFrame(survivors, schema),
                    ["status", "price"],
                )
            ).collect()
        }
        if survivors
        else set()
    )
    assert got == want


# --- compaction_plan: the distributed NFD fold equals the sequential
# model on arbitrary file lists ---------------------------------------------


@given(
    st.lists(st.integers(1, 40), min_size=1, max_size=20),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_compaction_fold_matches_python_nfd(spark, tmp_path_factory, sizes):
    """One (priority, month) partition with one file per day: the
    query's fold must equal a sequential next-fit-decreasing pack, and
    every bin must respect the target by construction."""
    from codex_data_products_spark.queries.linkage import compaction_plan

    tmp = tmp_path_factory.mktemp("nfd")
    rows = []
    oid = 0
    for day, n in enumerate(sizes, start=1):
        for _ in range(n):
            rows.append(
                (oid, 1, "O", 10.0, "2024-03-%02d 00:00:00" % day,
                 "1-URGENT")
            )
            oid += 1
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    d = str(tmp / "sf")
    orders.coalesce(1).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    (r,) = compaction_plan(spark, d).collect()

    total, mx = sum(sizes), max(sizes)
    target = max(mx, (total + 7) // 8)
    bins, fill = 1, 0
    for s in sorted(sizes, reverse=True):
        if fill + s <= target:
            fill += s
        else:
            bins, fill = bins + 1, s
    assert r["target"] == target
    assert r["n_bins"] == bins
    assert r["n_files"] == len(sizes) and r["total_size"] == total


# --- er_clusters: the fixed-round propagation equals union-find ------------


@given(
    st.lists(
        st.text(alphabet="ab", min_size=3, max_size=5),
        min_size=1,
        max_size=10,
        unique=True,
    )
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_er_clusters_equals_union_find(spark, tmp_path_factory, adjs):
    """Random same-block name sets: the 7-round propagation's entities
    must equal a sequential union-find over the same levenshtein<=3
    pair predicate, every entity canonical = min member, all
    converged."""
    from codex_data_products_spark.queries.linkage import er_clusters

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    names = [f"{adj} bolt" for adj in adjs]
    parent = {n: n for n in names}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if abs(len(a) - len(b)) <= 3 and lev(a, b) <= 3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for n in names:
        want.setdefault(find(n), []).append(n)
    want_rows = {
        (min(ms), len(ms), 2 * len(ms))
        for ms in want.values()
        if len(ms) >= 2
    }

    tmp = tmp_path_factory.mktemp("er")
    rows = []
    pk = 0
    for n in names:
        for _ in range(2):
            rows.append((pk, n, "B", "T", 1, 1.0))
            pk += 1
    parts = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    d = str(tmp / "sf")
    parts.coalesce(1).write.mode("overwrite").parquet(f"{d}/part.parquet")
    collected = er_clusters(spark, d).collect()
    got = {
        (r["entity"], r["n_names"], r["n_rows"]) for r in collected
    }
    assert got == want_rows
    assert all(r["converged"] for r in collected)


# --- band_join_buckets: the 3-cell expansion finds EXACTLY the
# brute-force pair set -------------------------------------------------------


@given(
    st.lists(st.integers(0, 600), min_size=1, max_size=12),
    st.lists(st.integers(0, 600), min_size=1, max_size=12),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_band_join_equals_brute_force(spark, tmp_path_factory, cs, vs):
    """Random click/view second-offsets in a 10-minute span: the
    bucket-expansion join must produce exactly the |gap| <= 120 s
    brute-force pair multiset, bucketed identically."""
    from codex_data_products_spark.queries.joins import band_join_buckets

    tmp = tmp_path_factory.mktemp("band")
    rows, eid = [], 0
    for s in cs:
        rows.append((eid, f"2024-03-01 10:{s // 60:02d}:{s % 60:02d}", 1,
                     "click", 1.0, "{}"))
        eid += 1
    for s in vs:
        rows.append((eid, f"2024-03-01 10:{s // 60:02d}:{s % 60:02d}", 1,
                     "view", 1.0, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp / "sf")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    want: dict = {}
    for c in cs:
        for v in vs:
            gap = abs(c - v)
            if gap <= 120:
                direction = ("view_first" if v < c
                             else "click_first" if v > c
                             else "simultaneous")
                key = (direction, gap // 30)
                want[key] = want.get(key, 0) + 1
    got = {
        (r["direction"], r["gap_bucket"]): r["n_pairs"]
        for r in band_join_buckets(spark, d).collect()
    }
    assert got == want


# --- exact substring-span coverage vs a brute-force Python model -----------
# Random tiny corpora over a 3-letter alphabet force heavy k-gram
# collisions; the engine's window-union coverage must equal a literal
# per-position model (mark every position whose k-gram occurs >= 2
# times anywhere, union the fixed-length windows, count covered
# tokens).


@st.composite
def _tiny_corpus(draw):
    n_docs = draw(st.integers(2, 5))
    return [
        (
            i,
            " ".join(
                draw(
                    st.lists(
                        st.sampled_from(["a", "b", "c"]),
                        min_size=1,
                        max_size=24,
                    )
                )
            ),
        )
        for i in range(n_docs)
    ]


def _coverage_model(rows, k):
    from collections import Counter

    toks = {i: t.split() for i, t in rows}
    grams = Counter()
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            grams[tuple(ts[p : p + k])] += 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for p in range(len(ts) - k + 1):
            if grams[tuple(ts[p : p + k])] >= 2:
                covered.update(range(p, p + k))
        if covered:
            out[i] = (len(ts), len(covered))
    return out


@given(_tiny_corpus())
@settings(**SPARK_SETTINGS)
def test_substring_coverage_matches_python_model(spark, corpus):
    from codex_data_products_spark.queries.dedup import (
        SUBSTR_K,
        _coverage_per_doc,
        duplicated_positions,
        positional_grams,
    )

    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    pos = positional_grams(docs).persist()
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in _coverage_per_doc(duplicated_positions(pos)).collect()
    }
    pos.unpersist()
    assert got == _coverage_model(corpus, SUBSTR_K)
