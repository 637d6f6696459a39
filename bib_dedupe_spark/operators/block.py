"""Blocking stage: multi-pass candidate-pair generation as one Spark plan.

Behavioral spec: /root/reference/bib_dedupe/block.py (rule list :23-56,
pair generation :59-104, same-set pruning :127-149, title-overlap pruning
:152-198, driver :201-307).

Spark-first design (replaces the reference's 16-process pool + pandas
groupby/combinations):

  prepared records
    → per-record ARRAY of (rule_idx, composite key) entries, one per
      blocking rule whose fields are all non-empty        (explode, no UDF)
      + (title, tokens, search_set) pruning payload per key row
    → hash-partitioned self-equi-join on (rule_idx, key) with ID_1 < ID_2
    → INLINE pruning on the join output (same stage, no extra joins):
      same-search-set rows dropped; title-overlap verdict computed as a
      boolean (applies only when every producing rule requires overlap)
    → groupBy(ID_1, ID_2): first rule by rule order, AND of the
      require-title-overlap flags, overlap verdict        (single shuffle)
    → filter(title_ok | !require)  — raw pairs never reach a record join
    → two enrichment joins against the records (survivors only)

Skew handling: composite keys are explicit columns, so hot keys are
observable; keys whose group exceeds ``max_block_size`` are dropped from
pair generation (logged via the returned metrics accumulator) instead of
producing O(k²) pairs — the reference simply eats that cost in one
process. AQE skew-join splitting covers residual join skew.

The NaN quirk: the reference leaves ``author_first`` as NaN for empty
authors (prep.py:241), and NaN passes its non-empty blocking filter, so
empty-author records DO block together on the remaining fields. We mirror
this with a reserved sentinel for null ``author_first``.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bib_dedupe_spark import constants as C

# (fields, require_title_overlap); overlap required iff the rule shares no
# field with {title_short, doi, pages} (block.py:96-98). Field order within
# a key follows the reference's set-literal iteration only up to grouping
# equality — any fixed order yields identical groups.
BLOCKING_RULES = [
    ((C.AUTHOR_FIRST, C.YEAR), True),
    ((C.AUTHOR_FIRST, C.CONTAINER_TITLE_SHORT), True),
    ((C.TITLE_SHORT, C.PAGES), False),
    ((C.TITLE_SHORT, C.AUTHOR_FIRST), False),
    ((C.TITLE_SHORT, C.VOLUME), False),
    ((C.TITLE_SHORT, C.CONTAINER_TITLE_SHORT), False),
    ((C.TITLE_SHORT, C.YEAR), False),
    ((C.CONTAINER_TITLE_SHORT, C.VOLUME, C.NUMBER), True),
    ((C.CONTAINER_TITLE_SHORT, C.VOLUME, C.YEAR), True),
    ((C.CONTAINER_TITLE_SHORT, C.VOLUME, C.PAGES), False),
    ((C.CONTAINER_TITLE_SHORT, C.YEAR, C.PAGES), False),
    ((C.YEAR, C.VOLUME, C.NUMBER), True),
    ((C.YEAR, C.VOLUME, C.PAGES), False),
    ((C.YEAR, C.NUMBER, C.PAGES), False),
    ((C.DOI,), False),
    ((C.ABSTRACT,), True),
]

# sentinel standing in for the reference's NaN author_first; groups nulls
# together and passes the non-empty filter, like NaN does in pandas
_NULL_KEY = "\x00<null>"
_KEY_SEP = "\x1f"

# rules whose pairs require title-word overlap downstream (block.py:96-98)
_RTO_RULE_IDXS = frozenset(
    i for i, (_f, rto) in enumerate(BLOCKING_RULES) if rto
)


def rule_name(fields: tuple) -> str:
    return "-".join(fields)


def _key_entries_column():
    """Array column of (rule_idx, rto, key) structs, one per passing rule.

    Memoized per JVM gateway: building this Column costs ~0.5 s of py4j
    round-trips, and streaming rebuilds the blocking plan every
    micro-batch (profiled as a top per-batch fixed cost).
    """
    from bib_dedupe_spark.plancache import cached_fragment

    return cached_fragment("block._key_entries_column", _build_key_entries)


def _build_key_entries():
    entries = []
    for idx, (fields, rto) in enumerate(BLOCKING_RULES):
        parts = [F.coalesce(F.col(f), F.lit(_NULL_KEY)) for f in fields]
        non_empty = reduce(
            lambda a, b: a & b, [p != "" for p in parts]
        )
        key = F.concat_ws(_KEY_SEP, *parts)
        entries.append(
            F.when(
                non_empty,
                F.struct(
                    F.lit(idx).alias("rule_idx"),
                    F.lit(rto).alias("rto"),
                    key.alias("key"),
                ),
            )
        )
    return F.array_compact(F.array(*entries))


_CARRY = ("_th", "_sp", "_tl", "_nt", "_tokh", "_ss")


def _carry_columns():
    """Per-record pruning payload carried through the key table.

    The payload rides EVERY key row (one per passing blocking rule, up
    to 16 per record) through the heaviest shuffles of the job, so it is
    hashed down to fixed-width proxies instead of shipping the title and
    its token multiset as strings: _th = xxhash64(title) (title-equality
    exemption), _sp = title has a space (wildcard/exemption), _tl =
    title length (the both-empty case), _nt = token-multiset size (the
    prune denominator), _tokh = DISTINCT xxhash64 per token (the prune's
    shared-distinct-word count — array_intersect is set-semantics either
    way). Only the search_set string stays verbatim (short, and its
    null-propagation semantics must match the reference exactly). A
    64-bit cross-token collision flips one prune verdict with
    probability ~2^-50 at corpus scale — the same accepted trade as the
    harness token_overlap_prune query. Measured: the string payload was
    ~2× the key-row bytes and array_intersect over strings dominated the
    raw-pair stage CPU.
    """
    from bib_dedupe_spark.plancache import cached_fragment

    def _build():
        title = F.col(C.TITLE)
        tokens = F.filter(F.split(title, " "), lambda x: x != "")
        return [
            F.xxhash64(title).alias("_th"),
            title.contains(" ").alias("_sp"),
            F.length(title).alias("_tl"),
            F.size(tokens).alias("_nt"),
            F.array_distinct(
                F.transform(tokens, lambda x: F.xxhash64(x))
            ).alias("_tokh"),
            F.col(C.SEARCH_SET).alias("_ss"),
        ]

    return cached_fragment("block._carry_columns_hashed", _build)


def _inline_prune_flags(df: DataFrame) -> DataFrame:
    """ss-prune rows out; compute the pair-level title-overlap verdict.

    Both pruning predicates are PAIR-level and rule-independent, so they
    evaluate on the self-join output itself (map-side, same stage as the
    join) instead of on separate record joins after aggregation: the raw
    pair stream shrinks before it ever hits the distinct shuffle, and the
    surviving pairs reach enrichment already pruned. The search-set drop
    removes whole pairs (every row of a pair agrees); the title verdict
    is carried as one boolean because whether it APPLIES depends on the
    aggregated require-title-overlap flag (AND over producing rules) —
    attribution still sees every producing rule, exactly like the
    reference's prune-after-dedupe order (block.py:152-198,272-276).
    """
    for side in ("1", "2"):
        if f"_tokh_{side}" not in df.columns:
            # delta path ships (title, search_set) strings through its
            # broadcast join; derive the hashed prune payload here, on
            # the join output (survivors only)
            t = F.col(f"_title_{side}")
            toks = F.filter(F.split(t, " "), lambda x: x != "")
            df = (
                df.withColumn(f"_th_{side}", F.xxhash64(t))
                .withColumn(f"_sp_{side}", t.contains(" "))
                .withColumn(f"_tl_{side}", F.length(t))
                .withColumn(f"_nt_{side}", F.size(toks))
                .withColumn(
                    f"_tokh_{side}",
                    F.array_distinct(
                        F.transform(toks, lambda x: F.xxhash64(x))
                    ),
                )
            )
    exempt = (
        (F.col("_th_1") == F.col("_th_2"))
        | (~F.col("_sp_1"))
        | (~F.col("_sp_2"))
    )
    shared = F.size(F.array_intersect("_tokh_1", "_tokh_2"))
    denom = F.least(F.col("_nt_1") + 1, F.col("_nt_2") + 1)
    both_empty = (F.col("_tl_1") + F.col("_tl_2")) == 0
    low_overlap = F.when(both_empty, F.lit(True)).otherwise(
        (shared / denom) < 0.5
    )
    return (
        df.filter(
            ~(
                (F.col("_ss_1") == F.col("_ss_2"))
                & (F.col("_ss_1") != "")
            )
        )
        .withColumn("_title_ok", exempt | ~low_overlap)
        .select("ID_1", "ID_2", "rule_idx", "rto", "_title_ok")
    )


def _refine_base(keys: DataFrame, hot_ref: DataFrame) -> DataFrame:
    """Hot-group key rows with distinct-token count and wildcard flag."""
    base = keys.join(F.broadcast(hot_ref), ["rule_idx", "key"])
    return base.withColumn("_d", F.size("_tokh")).withColumn(
        "_wc", (~F.col("_sp")) | (F.col("_d") == 0)
    )


def _word_prefix_tables(base: DataFrame):
    """(all-words, prefix-words) tables for the refined word join.

    ``prefix`` keeps each non-wildcard record's ⌊(d−1)/2⌋+1 rarest
    distinct token hashes (group-local document frequency ``_wdf``, ties
    by hash — the pigeonhole superset guarantee holds for ANY fixed-size
    choice among equally-rare tokens) — the probe side of the AllPairs
    join; ``words`` is the full index side. Tokens travel as xxhash64
    longs (see :func:`_carry_columns`), so the wdf shuffle and the join
    keys are fixed 8-byte values.
    """
    words = base.filter(~F.col("_wc")).select(
        "rule_idx",
        "rto",
        "key",
        C.ID,
        *_CARRY,
        F.col("_d"),
        F.explode("_tokh").alias("_w"),
    )
    wdf = words.groupBy("rule_idx", "key", "_w").agg(
        F.count("*").alias("_wdf")
    )
    win = Window.partitionBy("rule_idx", "key", C.ID).orderBy("_wdf", "_w")
    prefix = (
        words.join(wdf, ["rule_idx", "key", "_w"])
        .withColumn("_rank", F.row_number().over(win))
        .filter(F.col("_rank") <= F.floor((F.col("_d") - 1) / 2) + 1)
    )
    return words, prefix


# Route a hot overlap-rule group to the word join only when its estimated
# emission is under this fraction of the all-pairs volume: low-vocabulary
# groups (every title shares words with every other) would emit MORE
# word-join rows than the quadratic join they replace.
REFINE_COST_RATIO = 0.5

# ... and only when the hot set's TOTAL all-pairs volume is large
# enough for the word join's fixed plan cost to pay off. The refinement
# chain (wdf shuffle + prefix windows + routing-estimate collect +
# attribution-recovery joins) is built ONCE over every candidate key,
# so its near-constant wall-time slice amortizes across the whole hot
# set — the floor is therefore on the SUM of the candidates' quadratic
# volumes, not per key. Measured on local[32]: 5 hot keys totalling
# ~22M quadratic pairs ran 13.0 s salted vs 33.9 s refined (fixed cost
# dominates), a 155k-record zipf probe at 58.5M total was a wash
# (93.9 s salted vs ~100 s), and the round-5 232k/620k zipf probes
# (131.7M+ total) won 339 vs 529 s and 963 vs 1412 s refined. Floor set
# at the wash point; per-key est routing (REFINE_COST_RATIO) still
# sends dense-vocabulary keys back individually. Both branches are
# exact, so this is purely a physical-plan choice.
REFINE_MIN_QUAD_PAIRS = 128_000_000


def word_join_cost(keys: DataFrame, hot_ref: DataFrame) -> DataFrame:
    """Exact per-key emission estimate of the refined word join.

    Each prefix row (record, word) matches ``_wdf`` index rows, so the
    join's output volume per (rule, key) is Σ_prefix _wdf — computed
    from the same word/prefix tables the join itself would use. Routing
    on it is semantics-free: both branches produce the identical final
    pair set; this only picks the cheaper physical plan per group.

    Diagnostic/standalone form — :func:`candidate_pairs` inlines the
    same aggregation over its shared prefix table so the routing
    estimate and the pair join reuse one plan (and one persist, with
    ``cache_out``).
    """
    _words, prefix = _word_prefix_tables(_refine_base(keys, hot_ref))
    return prefix.groupBy("rule_idx", "key").agg(
        F.sum("_wdf").alias("_est")
    )


def _refined_hot_pairs(
    base: DataFrame,
    words: DataFrame,
    prefix: DataFrame,
    salt_bucket_size: int,
    sided,
    out_cols: list,
) -> DataFrame:
    """Candidate pairs for hot require-title-overlap groups WITHOUT the
    quadratic all-pairs join — provably output-preserving.

    Inside a group, the downstream title-overlap prune
    (:func:`_inline_prune_flags`, mirroring reference block.py:152-198)
    keeps a pair only if (a) either title has no space, (b) titles are
    identical, or (c) DISTINCT shared words ≥ 0.5·(min(multiset len)+1).
    So instead of generating all k²/2 pairs and pruning, generate only a
    superset of the survivors:

    * **wildcards** (no-space titles, plus zero-token degenerates that
      can only pass via identical titles) × everyone — these pairs are
      prune-exempt, i.e. necessary output; bucketed like the salted join
      so no task sees more than ``salt_bucket_size`` targets per probe.
    * **prefix-filtered word join** (AllPairs-style) for the rest: each
      record indexes ALL its distinct title words, but probes with only
      its ⌊(d−1)/2⌋+1 rarest (group-local document frequency, ties by
      token hash) — any pair passing (b) or (c) shares > half the smaller
      distinct set, so the smaller record's rarest-half prefix must
      contain a shared word. Common words (stopwords) almost never land
      in prefixes, which is exactly what kills the quadratic term at
      low-entropy keys.

    Generated ⊆ all-pairs and ⊇ prune survivors, and the exact prune
    still runs downstream, so the final pair set is bit-identical to the
    salted path (pinned by tests/test_block_refine.py differential).
    First-rule attribution for pairs this generator legitimately skips is
    restored exactly by the post-prune recovery join in
    :func:`candidate_pairs`.

    ``base`` / ``words`` / ``prefix`` are the :func:`_refine_base` /
    :func:`_word_prefix_tables` outputs already restricted to the ROUTED
    hot keys. The caller builds them ONCE over every refine-candidate
    key (the cost estimate reads the same ``prefix``), so the
    wdf-shuffle + window chain is not recomputed per consumer; because
    ``_wdf`` and the prefix rank are group-local to (rule_idx, key),
    filtering the prebuilt tables by routed key is bit-identical to
    rebuilding them from the routed subset.
    """

    # --- wildcard × all (bucketed; each unordered pair emitted once) ---
    n_buckets = F.ceil(F.col("_block_n") / F.lit(salt_bucket_size)).cast(
        "int"
    )
    probe = sided(
        base.filter("_wc").withColumn(
            "_to", F.explode(F.sequence(F.lit(0), n_buckets - 1))
        ),
        "l",
        ("rule_idx", "rto", "key", "_to"),
    )
    target = sided(
        base.withColumn(
            "_to", F.pmod(F.xxhash64(C.ID), n_buckets).cast("int")
        ).withColumn("_wc_r", F.col("_wc")),
        "r",
        ("rule_idx", "key", "_to", "_wc_r"),
    )
    wc_pairs = (
        probe.join(target, ["rule_idx", "key", "_to"])
        .filter(
            (~F.col("_wc_r") & (F.col("ID_l") != F.col("ID_r")))
            | (F.col("ID_l") < F.col("ID_r"))
        )
        .select(*out_cols)
    )

    # --- prefix-filtered word join over non-wildcards ---
    word_pairs = (
        sided(prefix, "l", ("rule_idx", "rto", "key", "_w"))
        .join(
            sided(words, "r", ("rule_idx", "key", "_w")),
            ["rule_idx", "key", "_w"],
        )
        .filter(F.col("ID_l") != F.col("ID_r"))
        .select(*out_cols)
    )
    return wc_pairs.unionByName(word_pairs)


SALT_BUCKET_SIZE = 512

# Upper bound on hot blocking keys materialized to the driver by
# candidate_pairs. The hot table is broadcast by both of its consumers,
# so it must be broadcast-sized anyway; ~100k (rule_idx, key, count)
# rows ≈ 10 MB. A corpus with more hot keys than this is degenerate for
# salt mode (the key set itself no longer fits a broadcast) — fail
# loudly rather than silently OOM the driver.
HOT_KEY_COLLECT_LIMIT = 100_000


def candidate_pairs(
    records_df: DataFrame,
    max_block_size: int | None = 1000,
    cache: bool = True,
    hot_key_strategy: str = "salt",
    prune: bool = False,
    surrogate_ids: bool = False,
    salt_bucket_size: int | None = None,
    refine_hot_keys: bool = True,
    cache_out: list | None = None,
    refine_min_quad: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (ID_1 < ID_2) with first-rule attribution.

    ``prune=False`` returns (ID_1, ID_2, rule_idx, require_title_overlap)
    — the raw aggregated pair table. ``prune=True`` (the block()/
    block_delta() path) additionally applies the search-set and
    title-overlap prunes INLINE: the key table carries each record's
    (title, tokens, search_set), the flags evaluate on the self-join
    output map-side, and the returned (ID_1, ID_2, rule_idx) table is
    already pruned — candidates never pay post-aggregation record joins
    just to be discarded (at 155k records that is 71M raw pairs pruned
    to ~1.5M).

    Hot-key skew: a blocking key shared by k records implies O(k²) pairs.
    With ``hot_key_strategy="salt"`` (default), keys whose group exceeds
    the salt bucket size are split into ⌈k / bucket⌉ deterministic salt
    buckets; within-bucket plus lower-triangular cross-bucket joins
    regenerate EXACTLY the same pair set while bounding every join
    group — the quadratic output is spread over many tasks instead of one
    reducer. ``"drop"`` removes keys above ``max_block_size`` outright
    (bounded-output mode; observable via :func:`blocking_key_stats`).

    ``salt_bucket_size`` (default min(max_block_size, SALT_BUCKET_SIZE))
    is the EXECUTION granularity, decoupled from the semantic
    ``max_block_size``: a join cell emits up to bucket² rows, so leaving
    the bucket at a 2000-record cap meant 4M-row cells and a straggler
    task tail at 1M records (measured: 8 tasks dominating the block
    stage). Salting is pair-set preserving, so a smaller bucket changes
    only task shape — groups between the bucket size and
    ``max_block_size`` route through the salted join too (in "drop" mode
    only keys above ``max_block_size`` are dropped, exactly as before).

    ``refine_hot_keys`` (default on; applies only with ``prune=True`` in
    salt mode): hot groups of require-title-overlap rules skip the
    quadratic salted self-join entirely and generate pairs through
    :func:`_refined_hot_pairs` — wildcard×all plus a prefix-filtered
    word join whose output is a superset of the downstream prune's
    survivors, so the FINAL pair set (and, via the post-prune recovery
    join, first-rule attribution) is bit-identical while the raw pair
    volume stops growing quadratically at low-entropy keys. Non-overlap
    rules' hot groups still use the salted join (their pairs are all
    legitimate output). ``refine_min_quad`` overrides
    ``REFINE_MIN_QUAD_PAIRS``, the AGGREGATE all-pairs-volume floor
    below which the whole hot rto set is routed to the salted join
    without building the refinement subplan at all (0 = always consider
    refinement — used by the refinement differential tests and the
    block_refined_pairs oracle, which pin the word-join generator on
    small fixtures).

    The exploded key table feeds several consumers; ``cache`` persists it
    so the upstream prep UDF pass runs once.

    ``cache_out`` — when given, the refined path's shared prefix-word
    table (whose two shuffles the routing cost estimate already forces)
    is persisted and appended to the list; the CALLER unpersists after
    consuming the returned pairs (match.py cache_out convention). When
    ``None`` (default) nothing is persisted here — the prefix chain is
    recomputed by the downstream action, trading one extra pass over the
    hot-key words for a leak-free default (streaming calls this per
    batch 0; a persist that outlives the call would accumulate).
    """
    base = records_df.filter(F.col(C.TITLE).isNotNull())

    id_map = None
    if surrogate_ids:
        # 8-byte surrogate ids through the (dominant) pair shuffles: at
        # web scale the record ID is a URL, and the raw pair stream would
        # otherwise carry two of them per row. xxhash64 is deterministic;
        # a collision would silently fuse two records, so its absence is
        # CHECKED (one aggregation over records — trivial next to pairs)
        # and the string path is used on the (astronomically rare) hit.
        # count(*) stands in for countDistinct(ID): one distinct
        # aggregate instead of two keeps the check plan Expand-free (a
        # corpus with REPEATED id rows now also routes to the string-id
        # path — purely a physical choice, both paths emit identical
        # pairs, and duplicate ids are degenerate input either way).
        id_map = base.select(C.ID, F.xxhash64(C.ID).alias("_nid"))
        counts_row = id_map.agg(
            F.count("*").alias("n_id"),
            F.countDistinct("_nid").alias("n_nid"),
        ).first()
        if counts_row["n_id"] != counts_row["n_nid"]:
            import warnings

            warnings.warn(
                "xxhash64 surrogate-id collision (or repeated input ids) "
                f"detected ({counts_row['n_id']} rows -> "
                f"{counts_row['n_nid']} hashes); falling back to string "
                "ids for this blocking pass",
                UserWarning,
                stacklevel=2,
            )
            id_map = None

    carry = _carry_columns() if prune else []
    id_col = (
        F.xxhash64(C.ID).alias(C.ID) if id_map is not None else F.col(C.ID)
    )
    keys = (
        base.select(id_col, *carry, F.explode(_key_entries_column()).alias("entry"))
        .select(
            C.ID,
            *(_CARRY if prune else ()),
            F.col("entry.rule_idx").alias("rule_idx"),
            F.col("entry.rto").alias("rto"),
            F.col("entry.key").alias("key"),
        )
    )
    if cache:
        from pyspark.storagelevel import StorageLevel

        keys = keys.persist(StorageLevel.MEMORY_AND_DISK)

    def _sided(df: DataFrame, side: str, cols: tuple) -> DataFrame:
        renames = {C.ID: f"ID_{side}"}
        if prune:
            renames.update({c: f"{c}_{side}" for c in _CARRY})
        out = df
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        return out.select(f"ID_{side}", *cols,
                          *(f"{c}_{side}" for c in (_CARRY if prune else ())))

    hot_pairs = None
    if max_block_size is not None:
        if salt_bucket_size is None:
            salt_bucket_size = min(max_block_size, SALT_BUCKET_SIZE)
        counts = keys.groupBy("rule_idx", "key").agg(
            F.count("*").alias("_block_n")
        )
        # The hot table feeds BOTH the anti-join and the salt join. It is
        # already constrained to broadcast size (each consumer broadcasts
        # it), so materialize it to the DRIVER once and rebuild it as a
        # local relation: the aggregation runs a single time and no cache
        # entry outlives this call — streaming calls block()/block_delta()
        # per micro-batch, and a persist() here used to leak one cached
        # frame per batch. When no key is hot (the common case) the anti-
        # join and salt machinery are skipped entirely.
        #
        # Two tiers: keys above max_block_size are DROPPED under "drop";
        # everything above the (smaller) salt bucket size is routed to
        # the salted join for task granularity — pair-set preserving.
        salt_threshold = (
            salt_bucket_size if hot_key_strategy == "salt" else max_block_size
        )
        # limit(N+1) bounds the driver materialization in the same job
        # that computes it: ≤ N rows back means we have ALL hot keys;
        # N+1 means the hot set exceeds broadcast size — refuse.
        hot_rows = (
            counts.filter(F.col("_block_n") > salt_threshold)
            .limit(HOT_KEY_COLLECT_LIMIT + 1)
            .collect()
        )
        if len(hot_rows) > HOT_KEY_COLLECT_LIMIT:
            raise ValueError(
                f"more than {HOT_KEY_COLLECT_LIMIT} blocking keys exceed "
                f"the hot-key threshold ({salt_threshold}): the hot-key "
                "table no longer fits a broadcast, which the salted join "
                "requires. This corpus's key entropy is too low for salt "
                "mode — raise salt_bucket_size/max_block_size, use "
                "hot_key_strategy='drop', or leave refine_hot_keys on "
                "(prune mode) so overlap-rule hot groups avoid the "
                "salted join."
            )
        hot = (
            records_df.sparkSession.createDataFrame(
                hot_rows, schema=counts.schema
            )
            if hot_rows
            else None
        )
    else:
        hot = None
        hot_rows = []
    refine_membership = None
    if hot is not None:
        keys_cold = keys.join(
            F.broadcast(hot.select("rule_idx", "key")),
            ["rule_idx", "key"],
            "left_anti",
        )
        if hot_key_strategy == "salt":
            refine = refine_hot_keys and prune
            if refine:
                # aggregate quadratic floor (REFINE_MIN_QUAD_PAIRS): the
                # word-join chain's fixed plan cost amortizes over ALL
                # candidate keys, so the go/no-go is on the SUM of their
                # all-pairs volumes — below it the salted join is the
                # cheaper exact plan for the whole set, and the entire
                # refinement subplan (word/prefix tables, the
                # routing-estimate collect, recovery joins) is skipped
                # outright. Above it, the per-key est router still
                # returns dense-vocabulary keys to salt individually.
                min_quad = (
                    REFINE_MIN_QUAD_PAIRS
                    if refine_min_quad is None
                    else refine_min_quad
                )
                cand = [
                    r for r in hot_rows if r["rule_idx"] in _RTO_RULE_IDXS
                ]
                total_quad = sum(
                    r["_block_n"] * (r["_block_n"] - 1) / 2 for r in cand
                )
                if total_quad >= min_quad:
                    ref_rows = cand
                    salt_rows = [
                        r
                        for r in hot_rows
                        if r["rule_idx"] not in _RTO_RULE_IDXS
                    ]
                else:
                    ref_rows, salt_rows = [], list(hot_rows)
            else:
                ref_rows, salt_rows = [], hot_rows
            if ref_rows:
                # cost-based routing per hot key: word-join only where
                # its measured emission beats the quadratic join (e.g. a
                # tiny-vocabulary group shares words everywhere and is
                # cheaper salted). Both branches are exact, so this is a
                # physical-plan choice, not a semantic one.
                #
                # The refine base + word/prefix tables are built ONCE
                # over every refine-candidate key and shared with the
                # generator below (filtered to the routed subset —
                # bit-identical because _wdf and the prefix rank are
                # group-local to (rule_idx, key)). With ``cache_out``
                # the prefix table (the wdf-shuffle + window chain the
                # cost collect forces anyway) is persisted so the
                # downstream pair join re-reads it instead of
                # recomputing both shuffles.
                cand_ref = records_df.sparkSession.createDataFrame(
                    ref_rows, schema=counts.schema
                )
                rbase = _refine_base(keys, cand_ref)
                rwords, rprefix = _word_prefix_tables(rbase)
                if cache_out is not None:
                    from pyspark.storagelevel import StorageLevel

                    rprefix = rprefix.persist(StorageLevel.MEMORY_AND_DISK)
                    cache_out.append(rprefix)
                # this collect returns ≤ len(ref_rows) rows, and
                # ref_rows ⊆ hot_rows is already bounded by
                # HOT_KEY_COLLECT_LIMIT above — the routing round-trip
                # can never exceed the hot-key collect's own bound. It
                # only runs at all when some key passed the
                # REFINE_MIN_QUAD_PAIRS floor; folding it into the
                # hot-key collect itself was examined and rejected: est
                # needs the hot key set first, and computing it for ALL
                # keys would replace a broadcast-driven bounded job with
                # a full shuffle of the key table.
                est = {
                    (r["rule_idx"], r["key"]): r["_est"]
                    for r in rprefix.groupBy("rule_idx", "key")
                    .agg(F.sum("_wdf").alias("_est"))
                    .collect()
                }
                routed = []
                for r in ref_rows:
                    n = r["_block_n"]
                    e = est.get((r["rule_idx"], r["key"]), 0)
                    if e < REFINE_COST_RATIO * n * (n - 1) / 2:
                        routed.append(r)
                    else:
                        salt_rows.append(r)
                ref_rows = routed

            swap = F.col("ID_l") > F.col("ID_r")
            hot_cols = [
                F.least("ID_l", "ID_r").alias("ID_1"),
                F.greatest("ID_l", "ID_r").alias("ID_2"),
                F.col("rule_idx"),
                F.col("rto"),
            ]
            if prune:
                for c in _CARRY:
                    hot_cols.append(
                        F.when(swap, F.col(f"{c}_r")).otherwise(
                            F.col(f"{c}_l")
                        ).alias(f"{c}_1")
                    )
                    hot_cols.append(
                        F.when(swap, F.col(f"{c}_l")).otherwise(
                            F.col(f"{c}_r")
                        ).alias(f"{c}_2")
                    )

            hot_pairs = None
            if salt_rows:
                hot_salt = records_df.sparkSession.createDataFrame(
                    salt_rows, schema=counts.schema
                )
                n_buckets = F.ceil(
                    F.col("_block_n") / F.lit(salt_bucket_size)
                ).cast("int")
                salted = keys.join(
                    F.broadcast(hot_salt), ["rule_idx", "key"]
                ).withColumn(
                    "_salt",
                    F.pmod(F.xxhash64(C.ID), n_buckets).cast("int"),
                )
                # Symmetric 2-D cell decomposition: a pair (a, b) with
                # salt buckets i ≤ j meets exactly in cell (_i=i, _j=j) —
                # the left side carries a record's replicas RIGHTWARD
                # (cells (salt, j), j ≥ salt), the right side DOWNWARD
                # (cells (i, salt), i ≤ salt); for i < j the pair is
                # produced once, for i == j twice ((a,b) and (b,a), same
                # as the unsalted self-join) and deduped by the
                # downstream (ID_1, ID_2) aggregation. Every join cell is
                # bucket × bucket (≤ salt_bucket_size² output) regardless
                # of group size — unlike a probe-vs-own-bucket layout,
                # whose LAST cell joins the whole group against one
                # bucket (bucket·k output in a single task: the measured
                # block straggler tail at a 1M-record corpus). Replica
                # shuffle volume is ~2× that layout, but replicas are
                # slim key rows; the join OUTPUT (which dominates) is
                # identical.
                salted_left = _sided(
                    salted.withColumn(
                        "_j",
                        F.explode(F.sequence(F.col("_salt"), n_buckets - 1)),
                    ).withColumn("_i", F.col("_salt")),
                    "l",
                    ("rule_idx", "rto", "key", "_i", "_j"),
                )
                salted_right = _sided(
                    salted.withColumn(
                        "_i",
                        F.explode(F.sequence(F.lit(0), F.col("_salt"))),
                    ).withColumn("_j", F.col("_salt")),
                    "r",
                    ("rule_idx", "key", "_i", "_j"),
                )
                hot_raw = (
                    salted_left.join(
                        salted_right, ["rule_idx", "key", "_i", "_j"]
                    ).filter(F.col("ID_l") != F.col("ID_r"))
                )
                hot_pairs = hot_raw.select(*hot_cols)
            if ref_rows:
                hot_ref = records_df.sparkSession.createDataFrame(
                    ref_rows, schema=counts.schema
                )
                routed_keys = F.broadcast(
                    hot_ref.select("rule_idx", "key")
                )
                refined = _refined_hot_pairs(
                    rbase.join(routed_keys, ["rule_idx", "key"]),
                    rwords.join(routed_keys, ["rule_idx", "key"]),
                    rprefix.join(routed_keys, ["rule_idx", "key"]),
                    salt_bucket_size,
                    _sided,
                    hot_cols,
                )
                hot_pairs = (
                    refined
                    if hot_pairs is None
                    else hot_pairs.unionByName(refined)
                )
                # membership table for exact first-rule attribution of
                # pairs the refined generator legitimately skips (no
                # shared prefix word) that survive via ANOTHER rule
                refine_membership = keys.join(
                    F.broadcast(hot_ref.select("rule_idx", "key")),
                    ["rule_idx", "key"],
                ).select(C.ID, "rule_idx", "key")
        keys = keys_cold

    if max_block_size is not None:
        # Cold-side self-join with ONE shuffle of the key table instead
        # of two, and singletons dropped before the join probe. The
        # explicit repartition on the join key makes both join sides
        # read the SAME exchange (ReusedExchange — the plain self-join
        # could not reuse it because the sides project different
        # columns below their exchanges); the window count's sort is by
        # exactly the join keys, so it doubles as the sort-merge sort
        # and drops singleton (rule, key) groups — the vast majority at
        # web scale, which the plain join shuffled into BOTH sides and
        # sorted just to produce nothing. Window partitions are bounded
        # by the hot threshold (hot keys were routed out above), so the
        # window buffers at most salt_threshold rows per group. Pair
        # multiset is unchanged (singletons produce no pairs; pinned by
        # the salting/refine differentials and the block oracles).
        keyed = keys.repartition("rule_idx", "key")
        nkey = Window.partitionBy("rule_idx", "key")
        keys_join = (
            keyed.withColumn("_n", F.count("*").over(nkey))
            .filter(F.col("_n") >= 2)
            .drop("_n")
        )
    else:
        keys_join = keys
    left = _sided(keys_join, "1", ("rule_idx", "rto", "key"))
    right = _sided(keys_join, "2", ("rule_idx", "key"))
    raw_pairs = (
        left.join(right, ["rule_idx", "key"])
        .filter(F.col("ID_1") < F.col("ID_2"))
        .select(
            "ID_1", "ID_2", "rule_idx", "rto",
            *(f"{c}_{s}" for c in (_CARRY if prune else ()) for s in ("1", "2")),
        )
    )
    if hot_pairs is not None:
        raw_pairs = raw_pairs.unionByName(hot_pairs)

    if prune:
        raw_pairs = _inline_prune_flags(raw_pairs)

    # one pair per (ID_1, ID_2): earliest rule wins the attribution,
    # overlap required only if EVERY producing rule required it
    # (block.py:272-276)
    aggs = [
        F.min("rule_idx").alias("rule_idx"),
        F.min(F.col("rto").cast("int")).cast("boolean").alias(
            "require_title_overlap"
        ),
    ]
    if prune:
        aggs.append(F.first("_title_ok").alias("_title_ok"))
    grouped = raw_pairs.groupBy("ID_1", "ID_2").agg(*aggs)
    if prune:
        grouped = grouped.filter(
            F.col("_title_ok") | ~F.col("require_title_overlap")
        ).select("ID_1", "ID_2", "rule_idx")
    if refine_membership is not None:
        grouped = _recover_attribution(grouped, refine_membership)
    if id_map is not None:
        # map surviving pairs back to string ids (two joins over the
        # POST-prune survivors — tiny next to the raw stream) and restore
        # the reference's string-order pair orientation
        rest = [c for c in grouped.columns if c not in ("ID_1", "ID_2")]
        grouped = (
            grouped.join(
                id_map.select(
                    F.col("_nid").alias("ID_1"), F.col(C.ID).alias("_sid_1")
                ),
                "ID_1",
            )
            .join(
                id_map.select(
                    F.col("_nid").alias("ID_2"), F.col(C.ID).alias("_sid_2")
                ),
                "ID_2",
            )
            .select(
                F.least("_sid_1", "_sid_2").alias("ID_1"),
                F.greatest("_sid_1", "_sid_2").alias("ID_2"),
                *rest,
            )
        )
    return grouped


def _recover_attribution(
    grouped: DataFrame, membership: DataFrame
) -> DataFrame:
    """Exact first-rule attribution under word-join refinement.

    A surviving pair whose records share a REFINED hot (rule, key)
    qualifies for that rule even if the word join never emitted it (the
    pair got through via another rule; reference attribution is min over
    ALL qualifying rules, block.py:272-277). Recompute qualification
    from the ``membership`` table — DataFrame[ID, rule_idx, key] of the
    refined hot groups — over survivors only, so both joins are
    post-prune-sized.
    """
    m1 = membership.select(
        F.col(C.ID).alias("ID_1"),
        F.col("rule_idx").alias("_hr"),
        "key",
    )
    m2 = membership.select(
        F.col(C.ID).alias("ID_2"),
        F.col("rule_idx").alias("_hr"),
        "key",
    )
    qual = (
        grouped.select("ID_1", "ID_2")
        .join(m1, "ID_1")
        .join(m2, ["ID_2", "_hr", "key"])
        .groupBy("ID_1", "ID_2")
        .agg(F.min("_hr").alias("_hr"))
    )
    return (
        grouped.join(qual, ["ID_1", "ID_2"], "left")
        .withColumn(
            "rule_idx",
            F.least(
                F.col("rule_idx"),
                F.coalesce(F.col("_hr"), F.lit(len(BLOCKING_RULES))),
            ),
        )
        .drop("_hr")
    )


def blocking_key_stats(records_df: DataFrame) -> DataFrame:
    """Per-(rule, key) group sizes — the skew observability surface."""
    return (
        records_df.select(C.ID, F.explode(_key_entries_column()).alias("e"))
        .groupBy(F.col("e.rule_idx").alias("rule_idx"), F.col("e.key").alias("key"))
        .agg(F.count("*").alias("group_size"))
    )


def _enrich(pruned_pairs: DataFrame, records_df: DataFrame) -> DataFrame:
    """Wide enrichment of ALREADY-PRUNED (ID_1, ID_2, rule_idx) pairs.

    Pruning happened inline in candidate generation (see
    :func:`candidate_pairs` prune=True), so only surviving pairs — a tiny
    fraction of raw candidates — pay the two 35-column record joins.
    """
    rule_names = F.array(
        *[F.lit(rule_name(fields)) for fields, _ in BLOCKING_RULES]
    )
    left_rec = records_df.select(
        *[F.col(c).alias(f"{c}_1") for c in C.PREPARED_FIELDS]
    )
    right_rec = records_df.select(
        *[F.col(c).alias(f"{c}_2") for c in C.PREPARED_FIELDS]
    )

    enriched = (
        pruned_pairs.join(left_rec, "ID_1", "left")
        .join(right_rec, "ID_2", "left")
        .withColumn(C.BLOCK_RULE, rule_names[F.col("rule_idx")])
    )

    return enriched.select(*C.pair_columns())


def block(
    records_df: DataFrame,
    max_block_size: int | None = 1000,
    cache: bool = True,
    hot_key_strategy: str = "salt",
    surrogate_ids: bool = True,
    refine_hot_keys: bool = True,
    cache_out: list | None = None,
    refine_min_quad: int | None = None,
) -> DataFrame:
    """Full blocking stage → enriched, pruned pair table.

    ``cache`` persists the (filtered) prepared records: they feed the key
    explode plus both enrichment joins — without it, an unpersisted prep
    stage would re-run its normalizer UDF pass for every consumer.
    ``hot_key_strategy`` / ``surrogate_ids`` — see
    :func:`candidate_pairs`. Surrogate ids default ON here: the raw pair
    shuffle carries two 8-byte longs instead of two record-id strings
    (urls at web scale) per row — measured 22% at 93k url-id records,
    identical pair + attribution sets, collision-checked with a loud
    string-path fallback.
    """
    records_df = records_df.filter(F.col(C.TITLE).isNotNull())
    if cache:
        from pyspark.storagelevel import StorageLevel

        records_df = records_df.persist(StorageLevel.MEMORY_AND_DISK)

    pairs = candidate_pairs(
        records_df,
        max_block_size=max_block_size,
        cache=cache,
        hot_key_strategy=hot_key_strategy,
        prune=True,
        surrogate_ids=surrogate_ids,
        refine_hot_keys=refine_hot_keys,
        cache_out=cache_out,
        refine_min_quad=refine_min_quad,
    )
    return _enrich(pairs, records_df)


def corpus_key_table(prepared_df: DataFrame) -> DataFrame:
    """Exploded blocking-key index
    DataFrame[ID, rule_idx, rto, key, title, search_set].

    The persistable index for incremental (delta) blocking: computing it
    once per record when the record ENTERS the corpus replaces
    re-exploding the whole corpus every micro-batch. The (title,
    search_set) payload lets block_delta prune candidates inline on the
    join output without a record join.
    """
    return (
        prepared_df.filter(F.col(C.TITLE).isNotNull())
        .select(
            C.ID,
            C.TITLE,
            C.SEARCH_SET,
            F.explode(_key_entries_column()).alias("entry"),
        )
        .select(
            C.ID,
            F.col("entry.rule_idx").alias("rule_idx"),
            F.col("entry.rto").alias("rto"),
            F.col("entry.key").alias("key"),
            C.TITLE,
            C.SEARCH_SET,
        )
    )


# Crossing-side refinement floor: a hot (rule, key) group is routed to
# the two-directional word join only when its batch×corpus fan-out is at
# least this many rows AND the batch holds at least CROSS_REFINE_MIN_NB
# members of the key (below that, the fan-out is O(|corpus group|) —
# the same order as the word join's own index pass, so refinement
# cannot win). Calibrated on the incremental probe's degenerate corpus
# (one corpus-wide author key): per-batch wall 19→82 s over 6 batches
# unrefined at 2.25M→13.5M fan-out. Purely physical routing — both
# branches produce the exact same pair set.
CROSS_REFINE_MIN_PAIRS = 1_000_000
CROSS_REFINE_MIN_NB = 8

# The crossing word join's per-emitted-row cost is higher than the
# fan-out join's per-pair cost (the chain pays wdf + two prefix windows
# + a four-way union + the recovery joins, where the fan-out is one
# codegen'd broadcast join feeding a partial aggregation). Measured on
# the cross-refine probe (zipf titles, 1500×3000 degenerate key):
# ~11 µs per word-join row vs ~2.8 µs per fan-out row — so the word
# join must cut emission by well over 4× before it wins. Route at 0.1:
# est below 10% of the fan-out volume is a clear win (entropic titles
# land at 1-2%), anything marginal stays on the fan-out.
CROSS_REFINE_COST_RATIO = 0.1


def _refined_crossing_pairs(
    batch_keys: DataFrame,
    corpus_frames: list,
    cand_rows: list,
    nb_map: dict,
    cache_out: list | None = None,
):
    """Batch×corpus pairs for hot rto keys via the word-join machinery.

    The batch×corpus analogue of :func:`_refined_hot_pairs`: wildcard ×
    all in both directions, plus a TWO-directional prefix word join
    (batch prefixes ⋈ corpus words AND corpus prefixes ⋈ batch words —
    the superset guarantee needs the smaller-multiset side of each pair
    to probe, and either side can be smaller). Prefix ranks use the
    COMBINED group-local document frequency; per-key routing uses the
    same exact emission estimate as candidate_pairs (Σ opposite-side
    wdf over prefix rows vs REFINE_COST_RATIO × nb·nc) so dense
    vocabularies fall back to the fan-out join, where the quadratic
    output is the prune's own input and nothing can be saved.

    Returns ``(raw_pair_rows, membership, routed_df)`` in the crossing
    raw schema, or ``None`` when the cost model routed every candidate
    back. The est collect is the only extra driver action and only runs
    when candidates exist; the wdf chain it forces is recomputed once by
    the downstream join (streaming keeps no caches per batch).
    """
    spark = batch_keys.sparkSession
    cand_df = F.broadcast(
        spark.createDataFrame(
            [(r, k) for (r, k) in cand_rows], schema="rule_idx int, key string"
        )
    )
    hb_raw = batch_keys.join(cand_df, ["rule_idx", "key"], "semi")
    hc_raw = corpus_frames[0].join(cand_df, ["rule_idx", "key"], "semi")
    for extra in corpus_frames[1:]:
        hc_raw = hc_raw.unionByName(
            extra.join(cand_df, ["rule_idx", "key"], "semi").select(
                *hc_raw.columns
            )
        )
    if cache_out is not None:
        # the hot-group tables feed the est collect, the four pair
        # branches, and the membership recovery — without a persist each
        # consumer re-SCANS the whole (growing) corpus key index, which
        # made per-batch cost grow faster than the fan-out it replaces
        # (measured). The semi-joined frames are group-sized, tiny next
        # to the index; the CALLER unpersists after the batch (streaming
        # cache_out convention).
        from pyspark.storagelevel import StorageLevel

        hb_raw = hb_raw.persist(StorageLevel.MEMORY_AND_DISK)
        hc_raw = hc_raw.persist(StorageLevel.MEMORY_AND_DISK)
        cache_out.extend([hb_raw, hc_raw])

    def _gen(df: DataFrame, p: str, with_rto: bool) -> DataFrame:
        toks = F.filter(F.split(F.col(C.TITLE), " "), lambda x: x != "")
        out = df.select(
            "rule_idx",
            *(["rto"] if with_rto else []),
            "key",
            F.col(C.ID).alias(f"_{p}id"),
            F.col(C.TITLE).alias(f"_{p}title"),
            F.col(C.SEARCH_SET).alias(f"_{p}ss"),
            F.array_distinct(
                F.transform(toks, lambda x: F.xxhash64(x))
            ).alias(f"_{p}tokh"),
        )
        return out.withColumn(
            f"_{p}wc",
            (~F.col(f"_{p}title").contains(" "))
            | (F.size(f"_{p}tokh") == 0),
        ).withColumn(f"_{p}d", F.size(f"_{p}tokh"))

    b_side = _gen(hb_raw, "b", True)
    c_side = _gen(hc_raw, "c", False)

    wb = b_side.filter(~F.col("_bwc")).select(
        "rule_idx", "rto", "key", "_bid", "_btitle", "_bss", "_bd",
        F.explode("_btokh").alias("_w"),
    )
    wc_r = c_side.filter(~F.col("_cwc")).select(
        "rule_idx", "key", "_cid", "_ctitle", "_css", "_cd",
        F.explode("_ctokh").alias("_w"),
    )
    # one aggregation carries the combined df (prefix ranking) and the
    # per-side dfs (the emission estimate needs the OPPOSITE side's df)
    tagged = wb.select(
        "rule_idx", "key", "_w", F.lit(1).alias("_isb")
    ).unionByName(
        wc_r.select("rule_idx", "key", "_w", F.lit(0).alias("_isb"))
    )
    wdf = tagged.groupBy("rule_idx", "key", "_w").agg(
        F.count("*").alias("_wdf"),
        F.sum("_isb").alias("_wb_df"),
        (F.count("*") - F.sum("_isb")).alias("_wc_df"),
    )
    win_b = Window.partitionBy("rule_idx", "key", "_bid").orderBy(
        "_wdf", "_w"
    )
    win_c = Window.partitionBy("rule_idx", "key", "_cid").orderBy(
        "_wdf", "_w"
    )

    def _prefix(words_df, win, d_col):
        return (
            words_df.join(wdf, ["rule_idx", "key", "_w"])
            .withColumn("_rank", F.row_number().over(win))
            .filter(F.col("_rank") <= F.floor((F.col(d_col) - 1) / 2) + 1)
        )

    # routing estimate from a DETERMINISTIC 1/16 record sample per side:
    # the wdf aggregation stays full (document frequencies must be
    # exact), but the per-record rarest-prefix windows — the expensive
    # part of the chain — run over sampled records only, so a batch
    # whose keys the router sends BACK to the fan-out join pays almost
    # nothing for having asked. The estimate only picks a physical
    # plan; both branches are exact.
    mod = 16
    est_rows = (
        _prefix(
            wb.filter(F.pmod(F.xxhash64(F.col("_bid")), mod) == 0),
            win_b,
            "_bd",
        ).select("rule_idx", "key", F.col("_wc_df").alias("_e"))
        .unionByName(
            _prefix(
                wc_r.filter(F.pmod(F.xxhash64(F.col("_cid")), mod) == 0),
                win_c,
                "_cd",
            ).select("rule_idx", "key", F.col("_wb_df").alias("_e"))
        )
        .groupBy("rule_idx", "key")
        .agg(F.sum("_e").alias("_est"))
        .collect()
    )
    est = {
        (r["rule_idx"], r["key"]): r["_est"] * mod for r in est_rows
    }
    routed = [
        rk
        for rk in cand_rows
        if est.get(rk, 0)
        < CROSS_REFINE_COST_RATIO * nb_map[rk][0] * nb_map[rk][1]
    ]
    import os as _os

    if _os.environ.get("SPARK_GRAFT_DEBUG_CROSS") == "1":
        import sys as _sys

        print(
            "[cross-refine] cand="
            + repr([(rk, nb_map[rk], est.get(rk, 0)) for rk in cand_rows])
            + f" routed={len(routed)}",
            file=_sys.stderr,
            flush=True,
        )
    if not routed:
        return None
    routed_df = F.broadcast(
        spark.createDataFrame(routed, schema="rule_idx int, key string")
    )

    def _routed(df: DataFrame) -> DataFrame:
        # _wdf and the prefix rank are group-local to (rule_idx, key):
        # filtering the prebuilt tables to the routed subset is
        # bit-identical to rebuilding them from it
        return df.join(routed_df, ["rule_idx", "key"], "semi")

    b_side, c_side = _routed(b_side), _routed(c_side)
    wb, wc_r = _routed(wb), _routed(wc_r)
    # the real (full) prefix tables are only built for ROUTED keys — a
    # fallback decision never pays for the per-record windows
    pb = _prefix(wb, win_b, "_bd")
    pc = _prefix(wc_r, win_c, "_cd")

    swap = F.col("_bid") > F.col("_cid")

    def _proj(df: DataFrame) -> DataFrame:
        return df.filter(F.col("_bid") != F.col("_cid")).select(
            F.least("_bid", "_cid").alias("ID_1"),
            F.greatest("_bid", "_cid").alias("ID_2"),
            "rule_idx",
            "rto",
            F.when(swap, F.col("_ctitle"))
            .otherwise(F.col("_btitle"))
            .alias("_title_1"),
            F.when(swap, F.col("_btitle"))
            .otherwise(F.col("_ctitle"))
            .alias("_title_2"),
            F.when(swap, F.col("_css"))
            .otherwise(F.col("_bss"))
            .alias("_ss_1"),
            F.when(swap, F.col("_bss"))
            .otherwise(F.col("_css"))
            .alias("_ss_2"),
        )

    # wildcard passes: batch wildcards × whole corpus group, corpus
    # wildcards × batch non-wildcards (each unordered pair once)
    wc1 = b_side.filter("_bwc").join(c_side, ["rule_idx", "key"])
    wc2 = b_side.filter(~F.col("_bwc")).join(
        c_side.filter("_cwc"), ["rule_idx", "key"]
    )
    dir1 = pb.select(
        "rule_idx", "rto", "key", "_w", "_bid", "_btitle", "_bss"
    ).join(
        wc_r.select("rule_idx", "key", "_w", "_cid", "_ctitle", "_css"),
        ["rule_idx", "key", "_w"],
    )
    dir2 = pc.select(
        "rule_idx", "key", "_w", "_cid", "_ctitle", "_css"
    ).join(
        wb.select(
            "rule_idx", "rto", "key", "_w", "_bid", "_btitle", "_bss"
        ),
        ["rule_idx", "key", "_w"],
    )
    raw = (
        _proj(wc1)
        .unionByName(_proj(wc2))
        .unionByName(_proj(dir1))
        .unionByName(_proj(dir2))
    )
    membership = (
        hb_raw.join(routed_df, ["rule_idx", "key"], "semi")
        .select(C.ID, "rule_idx", "key")
        .unionByName(
            hc_raw.join(routed_df, ["rule_idx", "key"], "semi").select(
                C.ID, "rule_idx", "key"
            )
        )
    )
    return raw, membership, routed_df


def block_delta(
    batch_prepared: DataFrame,
    corpus_keys: DataFrame,
    corpus_records: DataFrame,
    broadcast_batch: bool = True,
    fresh_corpus_keys: DataFrame | None = None,
    max_block_size: int | None = None,
    hot_key_strategy: str = "salt",
    refine_hot_keys: bool = True,
    crossing_refine_min_pairs: int | None = None,
    cache_out: list | None = None,
) -> DataFrame:
    """Incremental blocking: batch×batch plus batch×corpus pairs ONLY.

    Produces exactly ``block(corpus ∪ batch)`` restricted to pairs that
    touch the batch, without touching corpus×corpus again and — the
    scale point — WITHOUT re-exploding the corpus: candidate generation
    is an equi-join of the batch key table against the persisted
    ``corpus_keys`` index. At 10^12 corpus rows each micro-batch costs
    O(|batch| + matching key groups), not O(|corpus|).

    ``broadcast_batch=True`` (micro-batch default) hints the batch side
    broadcast — zero exchange anywhere. For LARGE batches (backfills)
    pass ``broadcast_batch=False`` and point ``corpus_keys`` at the
    compacted (rule_idx, key)-bucketed table
    (sources.io.compact_corpus_index): the sort-merge join then reads the
    index's buckets directly and exchanges ONLY the batch side — the
    index, the 10^12-row side, never shuffles (pinned by
    tests/test_streaming.py plan assertion). ``fresh_corpus_keys`` holds
    the small post-compaction parquet appends; they join separately
    (batch side broadcast) so their union does not erase the bucketed
    table's exchange-free property.

    Hot keys — a DEGENERATE key shared corpus-wide (measured in the wild:
    a webpages adapter collapsing every author to one token) makes the
    batch×batch join quadratic in |batch ∩ key| and the batch×corpus
    fan-out grow WITH THE CORPUS, so per-batch cost stops being flat:

    - ``hot_key_strategy="salt"`` (default when ``max_block_size`` set):
      the within-batch part delegates to :func:`candidate_pairs`' salted
      self-join (identical pair set, bounded join groups). For the
      crossing side, hot require-title-overlap keys above the fan-out
      floor route through :func:`_refined_crossing_pairs` (two-
      directional prefix word join + wildcard passes, est-gated by
      CROSS_REFINE_COST_RATIO with the exact downstream prune and the
      attribution-recovery join — pair set identical, pinned by
      test_block_delta_crossing_refinement_matches_combined); measured
      1.5× at a 1500×12000 entropic-title degenerate key and growing
      with the corpus, while dense-vocabulary keys (word join emission
      ≥ ~10% of the fan-out) stay on the fan-out join, which remains
      the cheaper exact plan there. ``refine_hot_keys=False`` or a huge
      ``crossing_refine_min_pairs`` restores the pure fan-out.
      ``cache_out`` collects the refinement's per-batch persists for
      the caller to release (streaming convention).
    - ``"drop"``: keys whose COMBINED (corpus + batch [+ fresh])
      membership exceeds ``max_block_size`` are dropped from BOTH sides —
      bounded per-batch output, exactly equal to
      ``block(corpus ∪ batch, max_block_size, "drop")`` restricted to
      batch-touching pairs (pinned in test_block_salting).

    ``corpus_records`` should be the ID-bucketed table so the enrichment
    joins read co-located buckets.
    """
    batch_keys = corpus_key_table(batch_prepared)

    if max_block_size is not None and hot_key_strategy == "drop":
        # combined membership counts: one slim aggregation over the key
        # tables (2 int/short-string columns), matching the hot set the
        # combined block-with-drop would compute
        sides = [batch_keys, corpus_keys]
        if fresh_corpus_keys is not None:
            sides.append(fresh_corpus_keys)
        combined = sides[0].select("rule_idx", "key")
        for s in sides[1:]:
            combined = combined.unionByName(s.select("rule_idx", "key"))
        hot = F.broadcast(
            combined.groupBy("rule_idx", "key")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_block_size)
            .select("rule_idx", "key")
        )
        batch_keys = batch_keys.join(hot, ["rule_idx", "key"], "left_anti")
        corpus_keys = corpus_keys.join(hot, ["rule_idx", "key"], "left_anti")
        if fresh_corpus_keys is not None:
            fresh_corpus_keys = fresh_corpus_keys.join(
                hot, ["rule_idx", "key"], "left_anti"
            )

    def _side(df: DataFrame, side: str, with_rto: bool) -> DataFrame:
        cols = [
            F.col(C.ID).alias(f"ID_{side}"),
            F.col("rule_idx"),
            F.col("key"),
            F.col(C.TITLE).alias(f"_title_{side}"),
            F.col(C.SEARCH_SET).alias(f"_ss_{side}"),
        ]
        if with_rto:
            cols.insert(2, F.col("rto"))
        return df.select(*cols)

    def _within() -> DataFrame:
        return (
            _side(batch_keys, "1", True)
            .join(_side(batch_keys, "2", False), ["rule_idx", "key"])
            .filter(F.col("ID_1") < F.col("ID_2"))
            .select("ID_1", "ID_2", "rule_idx", "rto", "_title_1",
                    "_title_2", "_ss_1", "_ss_2")
        )

    # -------- crossing-side hot-key refinement (salt mode) ------------
    # A DEGENERATE hot rto key fans each batch member out against the
    # whole corpus-side key group: O(|batch∩key| · |corpus∩key|) raw
    # rows per batch, growing with the corpus (measured 19→82 s/batch
    # over 6 batches on the degenerate probe). For hot rto keys above
    # the fan-out floor, pair generation switches to the same
    # AllPairs-style machinery candidate_pairs uses, adapted to the
    # batch×corpus shape: wildcard×all in both directions plus a
    # TWO-directional prefix word join (batch prefixes ⋈ corpus words
    # and corpus prefixes ⋈ batch words — the superset guarantee needs
    # the smaller-multiset side of each pair to probe, and either side
    # can be smaller). The exact overlap prune still runs downstream
    # and attribution is restored by the same post-prune recovery join,
    # so the pair set equals block(corpus ∪ batch) restricted to
    # batch-touching pairs (pinned by test_block_delta_refine).
    refine_cross = (
        refine_hot_keys
        and max_block_size is not None
        and hot_key_strategy == "salt"
    )
    hot_cross = None
    cross_membership = None
    hot_raw_pairs = None
    if refine_cross:
        min_pairs = (
            CROSS_REFINE_MIN_PAIRS
            if crossing_refine_min_pairs is None
            else crossing_refine_min_pairs
        )
        min_nb = CROSS_REFINE_MIN_NB if min_pairs > 0 else 1
        rto_list = sorted(_RTO_RULE_IDXS)
        # driver round-trip 1: batch-side member counts per rto key —
        # tiny (the batch is the small side by construction) and gated
        # so healthy batches pay ONLY this one cheap aggregation
        nb_rows = (
            batch_keys.filter(F.col("rule_idx").isin(rto_list))
            .groupBy("rule_idx", "key")
            .agg(F.count("*").alias("_nb"))
            .filter(F.col("_nb") >= min_nb)
            .limit(HOT_KEY_COLLECT_LIMIT + 1)
            .collect()
        )
        if nb_rows and len(nb_rows) <= HOT_KEY_COLLECT_LIMIT:
            spark = batch_prepared.sparkSession
            nb_only = {(r["rule_idx"], r["key"]): r["_nb"] for r in nb_rows}
            bk_df = spark.createDataFrame(
                list(nb_only), schema="rule_idx int, key string"
            )
            csides = [corpus_keys]
            if fresh_corpus_keys is not None:
                csides.append(fresh_corpus_keys)
            cunion = csides[0].select("rule_idx", "key")
            for s in csides[1:]:
                cunion = cunion.unionByName(s.select("rule_idx", "key"))
            # driver round-trip 2 (only when a batch key looked hot):
            # corpus-side member counts, restricted to those keys
            nc_rows = (
                cunion.join(F.broadcast(bk_df), ["rule_idx", "key"], "semi")
                .groupBy("rule_idx", "key")
                .agg(F.count("*").alias("_nc"))
                .collect()
            )
            nb_map = {
                (r["rule_idx"], r["key"]): (
                    nb_only[(r["rule_idx"], r["key"])],
                    r["_nc"],
                )
                for r in nc_rows
            }
            cand_rows = [
                rk for rk, (nb, nc) in nb_map.items()
                if nb * nc >= min_pairs
            ]
            if cand_rows:
                refined_out = _refined_crossing_pairs(
                    batch_keys, csides, cand_rows, nb_map,
                    cache_out=cache_out,
                )
                if refined_out is not None:
                    hot_raw_pairs, cross_membership, hot_cross = refined_out

    def _crossing(index_df: DataFrame, hint_broadcast: bool) -> DataFrame:
        cold_batch_keys = batch_keys
        if hot_cross is not None:
            # hot keys leave the fan-out join (their pairs come from the
            # refined generator below); excluding the batch side alone
            # removes the key from the equi-join
            cold_batch_keys = batch_keys.join(
                hot_cross, ["rule_idx", "key"], "left_anti"
            )
        probe = (
            F.broadcast(cold_batch_keys) if hint_broadcast else cold_batch_keys
        )
        joined = probe.join(
            index_df.select(
                F.col(C.ID).alias("_cid"),
                "rule_idx",
                "key",
                F.col(C.TITLE).alias("_ctitle"),
                F.col(C.SEARCH_SET).alias("_css"),
            ),
            ["rule_idx", "key"],
        ).filter(F.col(C.ID) != F.col("_cid"))
        swap = F.col(C.ID) > F.col("_cid")
        return joined.select(
            F.least(C.ID, "_cid").alias("ID_1"),
            F.greatest(C.ID, "_cid").alias("ID_2"),
            "rule_idx",
            "rto",
            F.when(swap, F.col("_ctitle")).otherwise(F.col(C.TITLE)).alias(
                "_title_1"
            ),
            F.when(swap, F.col(C.TITLE)).otherwise(F.col("_ctitle")).alias(
                "_title_2"
            ),
            F.when(swap, F.col("_css")).otherwise(F.col(C.SEARCH_SET)).alias(
                "_ss_1"
            ),
            F.when(swap, F.col(C.SEARCH_SET)).otherwise(F.col("_css")).alias(
                "_ss_2"
            ),
        )

    crossing = _crossing(corpus_keys, broadcast_batch)
    if fresh_corpus_keys is not None:
        crossing = crossing.unionByName(_crossing(fresh_corpus_keys, True))

    if hot_raw_pairs is not None:
        crossing = crossing.unionByName(hot_raw_pairs)

    def _agg_prune(raw: DataFrame) -> DataFrame:
        return (
            _inline_prune_flags(raw)
            .groupBy("ID_1", "ID_2")
            .agg(
                F.min("rule_idx").alias("rule_idx"),
                F.min(F.col("rto").cast("int")).cast("boolean").alias(
                    "require_title_overlap"
                ),
                F.first("_title_ok").alias("_title_ok"),
            )
            .filter(F.col("_title_ok") | ~F.col("require_title_overlap"))
            .select("ID_1", "ID_2", "rule_idx")
        )

    if max_block_size is not None and hot_key_strategy == "salt":
        # within-batch pairs via the salted generator (identical pair
        # set, bounded join groups); batch×batch and batch×corpus pair
        # sets are disjoint, so aggregating them separately is exact
        within_pairs = candidate_pairs(
            batch_prepared,
            max_block_size=max_block_size,
            cache=False,
            hot_key_strategy="salt",
            prune=True,
        )
        cross_pairs = _agg_prune(crossing)
        if cross_membership is not None:
            cross_pairs = _recover_attribution(cross_pairs, cross_membership)
        pairs = within_pairs.unionByName(cross_pairs)
    else:
        pairs = _agg_prune(_within().unionByName(crossing))

    all_records = corpus_records.unionByName(
        batch_prepared.select(*corpus_records.columns)
    ).filter(F.col(C.TITLE).isNotNull())
    return _enrich(pairs, all_records)
