"""Property-based tests (hypothesis) for the dialect layer.

Pattern: hypothesis generates a batch of values, ONE Spark job evaluates
the expression over all of them, and each result is checked against an
independent Python-side model (Decimal arithmetic, dict lookup). Batched
because a Spark job per example would be ~1s each; `max_examples` is kept
small since every example already covers dozens of generated values.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from live_data_spark.functions.dialect import decode
from live_data_spark.operators.text import normalized_text

_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_floats, min_size=1, max_size=50))
def test_round_half_up_matches_decimal_model(spark, xs):
    """F.round(x, 2) must round the double's shortest decimal repr
    HALF_UP — the same thing Decimal(repr(x)).quantize does. This is the
    contract the money-path (dec2) docstring claims."""
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r["y"] for r in df.select(F.round("x", 2).alias("y")).collect()]
    want = [
        float(Decimal(repr(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
        for x in xs
    ]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.sampled_from(["F", "M", "X", "zz", ""])), min_size=1, max_size=50)
)
def test_decode_matches_dict_model(spark, vals):
    """decode == exhaustive value map with NULL-safe matching: None maps
    through a None search key, unmatched → default (None here)."""
    mapping = {"F": "Female", "M": "Male", "X": "Non-binary", None: "Unknown"}
    df = spark.createDataFrame([(v,) for v in vals], "g string")
    got = [
        r["d"]
        for r in df.select(
            decode("g", "F", "Female", "M", "Male", "X", "Non-binary", None, "Unknown").alias("d")
        ).collect()
    ]
    want = [mapping.get(v) for v in vals]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
        min_size=1,
        max_size=30,
    )
)
def test_normalized_text_idempotent_and_ws_insensitive(spark, texts):
    """normalize(normalize(t)) == normalize(t), and padding/duplicating
    whitespace never changes the result — the invariant every dedup
    operator relies on (same input space for exact/MinHash/SimHash)."""
    rows = [(t, "  " + t.replace(" ", " \t ") + " \n") for t in texts]
    df = spark.createDataFrame(rows, "a string, b string")
    out = df.select(
        normalized_text("a").alias("na"),
        normalized_text(normalized_text("a")).alias("naa"),
        normalized_text("b").alias("nb"),
    ).collect()
    for r in out:
        assert r["naa"] == r["na"]
        assert r["nb"] == r["na"]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"), whitelist_characters="@.-+()"),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_pii_redact_idempotent(spark, texts):
    """redact(redact(x)) == redact(x): placeholders never re-match any
    pattern, so a second pass is a no-op — the property that makes the
    scrub safe to re-run over partially-processed corpora."""
    from live_data_spark.functions.dialect import decode  # noqa: F401  (fixture warm)
    from live_data_spark.operators.text import pii_redact

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = df.select(pii_redact("text").alias("r1"))
    twice = once.select(pii_redact("r1").alias("r2"))
    pairs = once.collect(), twice.collect()
    assert [r["r1"] for r in pairs[0]] == [r["r2"] for r in pairs[1]]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50))
def test_deterministic_sample_bucket_model(spark, keys):
    """The engine's hash-bucket sample equals the pure-Python model of the
    same arithmetic at ANY key magnitude (the % 100003 pre-reduction is
    what keeps the product inside int64 — see functions/dialect.py)."""
    from live_data_spark.functions.dialect import deterministic_sample

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = sorted(r["k"] for r in deterministic_sample(df, "k", pct=37).collect())
    want = sorted(k for k in keys if (k % 100003) * 2654435761 % 100 < 37)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=-50, max_value=50), st.integers(min_value=0, max_value=10**6)),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=1, max_value=9),
)
def test_global_rank_property_matches_window(spark, rows, nparts):
    """with_global_rank over arbitrary (key, uid) frames — duplicate keys,
    negative keys, skewed distributions, any partition count — must equal
    the unpartitioned row_number window on the same (key desc, uid) total
    order, and the attached total must equal the frame size."""
    from pyspark.sql import Window

    from live_data_spark.functions.ranks import with_global_rank

    df = spark.createDataFrame(rows, "k long, uid long")
    expect = {
        r["uid"]: r["rn"]
        for r in df.select(
            "uid",
            F.row_number()
            .over(Window.orderBy(F.col("k").desc(), F.col("uid")))
            .alias("rn"),
        ).collect()
    }
    ranked = with_global_rank(
        df,
        [F.col("k").desc(), F.col("uid").asc()],
        rank_col="r",
        total_col="n",
        num_partitions=nparts,
    ).collect()
    assert {r["uid"]: r["r"] for r in ranked} == expect
    assert all(r["n"] == len(rows) for r in ranked)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**12 - 1), st.integers(0, 2**12 - 1)),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_zorder_key_matches_python_interleave(spark, pts):
    """The Morton key built from Spark bit expressions must equal the
    Python-model bit interleave for arbitrary in-range points (and hence
    be injective, order-embedding the curve)."""
    from live_data_spark.functions.layout import zorder_key

    def model(a, b, bits=12):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    df = spark.createDataFrame(pts, "a long, b long")
    got = [r["z"] for r in df.select(zorder_key(["a", "b"], bits=12).alias("z")).collect()]
    want = [model(a, b) for a, b in pts]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=200),
    st.integers(2, 6),
)
def test_spacesaving_bounds_hold_for_any_stream(spark, stream, capacity):
    """SpaceSaving invariants for arbitrary streams and capacities
    (pure-Python core — no Spark job needed): at most `capacity`
    tracked items; for every tracked item true ≤ est and est − err ≤
    true; and any item with true count > N/capacity is guaranteed
    tracked (the classic frequent-items guarantee)."""
    from collections import Counter

    from live_data_spark.streaming.jobs import spacesaving_insert

    sketch = {}
    for x in stream:
        spacesaving_insert(sketch, x, 1, capacity)
    true = Counter(stream)
    assert len(sketch) <= capacity
    for item, (est, err) in sketch.items():
        assert true[item] <= est
        assert est - err <= true[item]
    n = len(stream)
    for item, c in true.items():
        if c > n / capacity:
            assert item in sketch, (item, c, n, capacity)


# -- BPE encoder properties (pure Python — no Spark in the loop) -------------


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abc", min_size=1, max_size=12),
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "ab", "bc", "ca", "ab</w>"]),
                  st.sampled_from(["a", "b", "c", "</w>", "ab", "bc"])),
        max_size=8,
        unique=True,
    ),
)
def test_encode_word_count_bounds_and_merge_monotonicity(word, merge_pairs):
    """For ANY word and ANY rank table: the token count is between 1 and
    len(word)+1 (chars + end mark, merges only shrink), and adding MORE
    merges never increases the count of a word the new merges can apply
    to... weaker but always-true form: count with a PREFIX of the rank
    table is >= count with the full table is impossible to guarantee
    (later merges can preempt earlier ones), so we assert the hard
    invariants only: bounds, determinism, and that an empty table gives
    exactly len(word)+1."""
    from live_data_spark.operators.tokenizer import encode_word

    ranks = {p: i for i, p in enumerate(merge_pairs)}
    n = encode_word(word, ranks)
    assert 1 <= n <= len(word) + 1
    assert n == encode_word(word, ranks)  # deterministic
    assert encode_word(word, {}) == len(word) + 1


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=12))
def test_ref_and_greedy_bpe_agree_end_to_end(words):
    """Train on random tiny corpora with the test-suite reference, then
    verify encode_word applied with the learned ranks reproduces the
    reference's final vocabulary segmentation lengths — ties between
    trainer (merge-order) and encoder (rank-greedy) semantics."""
    from collections import Counter

    from live_data_spark.operators.tokenizer import END_MARK, encode_word
    from tests.test_tokenizer import _ref_train

    freqs = Counter(words)
    merges = _ref_train(dict(freqs), 10)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    # replay the reference trainer's merge application to get final syms
    vocab = {w: list(w) + [END_MARK] for w in freqs}
    for l, r, _ in merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    for w in freqs:
        assert encode_word(w, ranks) == len(vocab[w]), (w, merges, vocab[w])


# -- epoch-resample hex-threshold model --------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_epoch_hex_threshold_equals_fraction_model(doc_id):
    """The md5-hex string compare used by corpus_epoch_resample must
    equal the arithmetic model: first-4-hex-as-int < frac·65536."""
    import hashlib

    from live_data_spark.operators.curation import EPOCH_FACTORS

    h = hashlib.md5(f"epoch:{doc_id}".encode()).hexdigest()[:4]
    for f in set(EPOCH_FACTORS.values()):
        frac = f - int(f)
        thr = f"{int(frac * 65536):04x}"
        assert (h < thr) == (int(h, 16) < int(frac * 65536))


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=30), min_size=0, max_size=40, unique=True),
    st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20, unique=True),
)
def test_bloom_no_false_negatives(spark, members, probes):
    """The Bloom pair's load-bearing invariant: every inserted key MUST
    test positive (a false negative would silently misclassify a
    dup_history doc as new in dedup_incremental_bloom — the oracle-parity
    tests only cover two fixed carves). Non-members may false-positive;
    that's the exact join's job. One blob + one probe job per example."""
    from live_data_spark.operators.dedup import bloom_blob, bloom_probe

    mdf = spark.createDataFrame([(m,) for m in members], "k string")
    blob = bloom_blob(mdf, "k")
    keys = sorted(set(members) | set(probes))
    pdf = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["maybe"]
        for r in pdf.crossJoin(F.broadcast(blob))
        .withColumn("maybe", bloom_probe("k"))
        .collect()
    }
    missed = [m for m in members if got[m] is not True]
    assert missed == [], f"bloom false negatives: {missed!r}"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            keys=st.integers(min_value=0, max_value=5),
            values=st.tuples(
                # updated_at, incl. NULL: a NULL-timestamped source row
                # must CARRY the open version (not vanish both rows — the
                # SQL-NULL comparison bug), and a NULL-timestamped open
                # row superseded by a real timestamp must close.
                st.one_of(st.none(), st.integers(min_value=0, max_value=100)),
                st.integers(min_value=0, max_value=3),  # attribute value
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_scd2_merge_matches_python_model(spark, batches):
    """snapshot_merge vs an independent pure-Python SCD2 model over random
    change-streams (dbt timestamp strategy): only an ADVANCED updated_at
    opens a new version (stale/equal/NULL updates ignored; a NULL open
    timestamp beaten by a real one closes), hard deletes carry forward,
    per-key intervals stay disjoint and contiguous, and exactly one open
    version exists per seen key. The catalog entry pins ONE deterministic
    stream; this pins the merge over the space of streams."""
    from collections import Counter

    from live_data_spark.plans.snapshot import initial_state, snapshot_merge

    schema = "k long, v long, updated_at long"

    def frame(batch):
        return spark.createDataFrame(
            [(k, v, upd) for k, (upd, v) in sorted(batch.items())], schema
        )

    def advanced(src_upd, upd):
        # mirrors the engine's F.coalesce(src > cur, cur NULL & src set)
        if src_upd is not None and upd is not None:
            return src_upd > upd
        return upd is None and src_upd is not None

    # python model: key -> list of [v, updated_at, valid_from, valid_to]
    model: dict[int, list[list]] = {}
    state = initial_state(frame(batches[0]), "updated_at")
    for k, (upd, v) in batches[0].items():
        model[k] = [[v, upd, upd, None]]
    for batch in batches[1:]:
        state = snapshot_merge(state, frame(batch), "k", "updated_at")
        for k, (upd, v) in batch.items():
            if k not in model:
                model[k] = [[v, upd, upd, None]]
                continue
            open_ver = model[k][-1]
            assert open_ver[3] is None
            if advanced(upd, open_ver[1]):
                open_ver[3] = upd  # close at the new version's updated_at
                model[k].append([v, upd, upd, None])

    got = [
        (r["k"], r["v"], r["updated_at"], r["dbt_valid_from"], r["dbt_valid_to"])
        for r in state.collect()
    ]
    want = [
        (k, v, upd, vf, vt) for k, vers in model.items() for v, upd, vf, vt in vers
    ]
    assert Counter(got) == Counter(want)
    # invariants the model construction already encodes, asserted on the
    # ENGINE output independently: one open version per key, disjoint
    # contiguous intervals (a NULL valid_from — a NULL-timestamped first
    # version — orders before every real timestamp)
    by_key: dict[int, list] = {}
    for k, v, upd, vf, vt in got:
        by_key.setdefault(k, []).append((vf, vt))
    for vers in by_key.values():
        vers.sort(key=lambda x: (x[0] is not None, x[0] if x[0] is not None else 0))
        assert sum(1 for _, vt in vers if vt is None) == 1
        for (_, vt1), (vf2, _) in zip(vers, vers[1:]):
            assert vt1 == vf2  # contiguous, disjoint


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            keys=st.integers(min_value=0, max_value=5),
            values=st.tuples(
                # compared column, incl. NULL (eqNullSafe: NULL→NULL
                # carries; NULL→value and value→NULL both version)
                st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
                st.integers(min_value=0, max_value=3),  # NON-compared col
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_scd2_check_merge_matches_python_model(spark, batches):
    """snapshot_merge_check vs a pure-Python model of dbt's check
    strategy over random change-streams: a new version opens iff the
    COMPARED column's value differs null-safely; the non-compared column
    never triggers and a carried row keeps its OLD value for it; hard
    deletes carry; versions stamp the run counter (asof), one open
    version per key, contiguous intervals. The catalog entry pins ONE
    deterministic stream; this pins the merge over the space of streams."""
    from collections import Counter

    from live_data_spark.plans.snapshot import (
        initial_state_check,
        snapshot_merge_check,
    )

    schema = "k long, v long, w long"

    def frame(batch):
        return spark.createDataFrame(
            [(k, v, w) for k, (v, w) in sorted(batch.items())], schema
        )

    # python model: key -> list of [v, w, valid_from, valid_to]
    model: dict[int, list[list]] = {}
    state = initial_state_check(frame(batches[0]), asof=0, vt_type="long")
    for k, (v, w) in batches[0].items():
        model[k] = [[v, w, 0, None]]
    for t, batch in enumerate(batches[1:], start=1):
        state = snapshot_merge_check(
            state, frame(batch), "k", check_cols=["v"], asof=t, vt_type="long"
        )
        for k, (v, w) in batch.items():
            if k not in model:
                model[k] = [[v, w, t, None]]
                continue
            open_ver = model[k][-1]
            assert open_ver[3] is None
            if open_ver[0] != v:  # null-safe compare: None != 2, None == None
                open_ver[3] = t
                model[k].append([v, w, t, None])
            # else: carried — keeps the OLD w even if the source's moved

    got = [
        (r["k"], r["v"], r["w"], r["dbt_valid_from"], r["dbt_valid_to"])
        for r in state.collect()
    ]
    want = [
        (k, v, w, vf, vt) for k, vers in model.items() for v, w, vf, vt in vers
    ]
    assert Counter(got) == Counter(want)
    by_key: dict[int, list] = {}
    for k, v, w, vf, vt in got:
        by_key.setdefault(k, []).append((vf, vt))
    for vers in by_key.values():
        vers.sort()
        assert sum(1 for _, vt in vers if vt is None) == 1
        for (_, vt1), (vf2, _) in zip(vers, vers[1:]):
            assert vt1 == vf2  # contiguous, disjoint


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**9),  # doc_id
            st.integers(min_value=1, max_value=10**5),  # n_grams
            st.integers(min_value=-(2**45), max_value=2**45),  # slrq
        ),
        min_size=1,
        max_size=150,
        unique_by=lambda t: t[0],
    )
)
def test_dsir_select_decomposition_property(spark, rows):
    """dsir_select's range decomposition (adaptive width, whole-keep /
    drop / cut-window arms) over ADVERSARIAL synthetic frames — single
    doc, near-identical slrq (all keys land in one cut range, width
    degenerates to ~1), 2^45-wide spans, gram totals small enough that
    the 30% budget floors to 0 — must equal the direct rule: docs in
    (sel_key desc, doc_id) order, kept iff their cumulative start is
    inside the budget. Uses Spark's OWN Gumbel keys so the pin isolates
    the decomposition, as in test_dsir_select_equals_global_prefix_rule
    (tests/test_curation.py) which covers the real-corpus path."""
    from live_data_spark.operators.curation import dsir_gumbel_key, dsir_select

    docw = spark.createDataFrame(rows, "doc_id long, n_grams long, slrq long")
    keyed = docw.select("doc_id", "n_grams", dsir_gumbel_key().alias("sel_key")).collect()
    ordered = sorted(keyed, key=lambda r: (-r["sel_key"], r["doc_id"]))
    budget = sum(r["n_grams"] for r in ordered) * 3 // 10
    want, start = set(), 0
    for r in ordered:
        if start < budget:
            want.add(r["doc_id"])
        start += r["n_grams"]
    assert {r["doc_id"] for r in dsir_select(docw).collect()} == want
