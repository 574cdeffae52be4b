"""Round-7 extension surface, part 2 of 4 (split from frontier3.py per
VERDICT r12 #7 — zero behavior change, sections moved verbatim): the
ER-BLOCKING / DEDUP-AUDIT / CONTRASTIVE-PAIR families — sorted-
neighborhood, phonetic-key and LSH-banding blockers with their union
audit, MinHash estimator audit, normalized-exact dedup, duplication
scorecard and cluster-size profile, contrastive dataset assembly and
hash negative sampling.  Shared doctrines in frontier3.py's hub
docstring."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table, read_state_parquet
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# dedup_sorted_neighborhood — classic ER blocking on the sorted key axis
# --------------------------------------------------------------------------
_SNM_CORPUS_SQL = """
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 10000, text || ' zq' FROM documents WHERE doc_id < 20
"""


@register(
    "dedup_sorted_neighborhood",
    oracle="""
    WITH corpus AS ({corpus}),
    norm AS (
      SELECT doc_id, lower(trim(text)) AS t FROM corpus
    ),
    ranked AS (
      SELECT doc_id, t,
             row_number() OVER (ORDER BY t, doc_id) AS rnk
      FROM norm
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
           CAST(b.rnk - a.rnk AS BIGINT) AS rank_gap,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
    FROM ranked a JOIN ranked b
      ON b.rnk > a.rnk AND b.rnk <= a.rnk + 10
    WHERE levenshtein(a.t, b.t) <= 4
    """.format(corpus=_SNM_CORPUS_SQL),
)
def dedup_sorted_neighborhood_q(spark, sf_dir):
    """Sorted-neighborhood entity-resolution blocking (Hernandez & Stolfo,
    SIGMOD 1995) on the same planted-edit corpus as
    `dedup_fuzzy_levenshtein`: sort every record by the normalized
    blocking key, slide a window of width w=10 down the sorted order, and
    exact-refine only in-window pairs (levenshtein <= 4).  Complements
    the prefix-bucket blocker: a prefix edit moves a record OUT of its
    prefix bucket but only a few positions in sort order, so the two
    blockers' misses are disjoint — production ER runs both and unions.
    The ORACLE states the rank theta-join definition; the ENGINE buckets
    rank by w and fans each LEFT row to {b, b+1} (the `join_band_bucketed`
    technique on the rank axis — a successor within w sits in the same or
    next bucket), each pair found exactly once since the right row owns
    one bucket.

    100 TB shape: the global rank is ONE RangePartitioner sort (Spark's
    distributed sort — the single-partition window here is the local[]
    rendering, the `agg_hist_equi_depth` doctrine); after it, candidate
    generation is a keyed equi-join with 2x fanout and per-task work
    bounded by bucket width, never all-pairs."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 300)
    edited = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    corpus = base.unionByName(edited).select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("t")
    )
    w = 10
    ranked = corpus.select(
        "doc_id", "t", F.row_number().over(Window.orderBy("t", "doc_id")).alias("rnk")
    )
    left = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.col("t").alias("ta"),
        F.col("rnk").alias("ra"),
        F.explode(
            F.array((F.col("rnk") / w).cast("long"), (F.col("rnk") / w + 1).cast("long"))
        ).alias("bucket"),
    )
    right = ranked.select(
        F.col("doc_id").alias("id_b"),
        F.col("t").alias("tb"),
        F.col("rnk").alias("rb"),
        (F.col("rnk") / w).cast("long").alias("bucket"),
    )
    return (
        left.join(right, "bucket")
        .filter((F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + w))
        .filter(F.levenshtein("ta", "tb") <= 4)
        .select(
            "id_a",
            "id_b",
            (F.col("rb") - F.col("ra")).cast("long").alias("rank_gap"),
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
        )
    )


# --------------------------------------------------------------------------
# dedup_minhash_estimate_audit — estimator quality of the MinHash signature
# --------------------------------------------------------------------------
_MINHASH_AUDIT_CORPUS = """
    SELECT doc_id, text FROM documents WHERE doc_id < 60
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 10
"""


@register(
    "dedup_minhash_estimate_audit",
    oracle="""
    WITH corpus AS ({corpus}),
    sh AS (
      SELECT DISTINCT doc_id AS id, substring(substring(text, 1, 60), i, 5) AS shingle
      FROM corpus, generate_series(1, 56) t(i)
      WHERE i <= greatest(length(substring(text, 1, 60)) - 4, 0)
    ),
    hs AS (
      SELECT id,
             ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h1,
             ('0x' || substring(md5(shingle), 9, 8))::BIGINT AS h2
      FROM sh
    ),
    sigs AS (
      SELECT id,
        MIN(h1 + 0 * h2) AS sig_0, MIN(h1 + 1 * h2) AS sig_1,
        MIN(h1 + 2 * h2) AS sig_2, MIN(h1 + 3 * h2) AS sig_3,
        MIN(h1 + 4 * h2) AS sig_4, MIN(h1 + 5 * h2) AS sig_5
      FROM hs GROUP BY id
    ),
    bands AS (
      SELECT id, md5('0' || '|' || CAST(sig_0 AS VARCHAR) || '|' || CAST(sig_1 AS VARCHAR)) AS band_key FROM sigs
      UNION ALL SELECT id, md5('1' || '|' || CAST(sig_2 AS VARCHAR) || '|' || CAST(sig_3 AS VARCHAR)) FROM sigs
      UNION ALL SELECT id, md5('2' || '|' || CAST(sig_4 AS VARCHAR) || '|' || CAST(sig_5 AS VARCHAR)) FROM sigs
    ),
    pairs AS (
      SELECT DISTINCT x.id AS a, y.id AS b
      FROM bands x JOIN bands y ON x.band_key = y.band_key AND x.id < y.id
    ),
    est AS (
      SELECT p.a, p.b,
        CAST((CASE WHEN sa.sig_0 = sb.sig_0 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_1 = sb.sig_1 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_2 = sb.sig_2 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_3 = sb.sig_3 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_4 = sb.sig_4 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_5 = sb.sig_5 THEN 1 ELSE 0 END) AS BIGINT)
          AS matches
      FROM pairs p JOIN sigs sa ON sa.id = p.a JOIN sigs sb ON sb.id = p.b
    ),
    sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT p.a, p.b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM pairs p
      JOIN sh x ON x.id = p.a
      JOIN sh y ON y.id = p.b AND y.shingle = x.shingle
      GROUP BY p.a, p.b
    )
    SELECT e.a, e.b, e.matches,
           CAST(1000000 * e.matches // 6 AS BIGINT) AS est_ppm,
           i.n_inter,
           CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union,
           CAST(1000000 * i.n_inter // (sa.n + sb.n - i.n_inter) AS BIGINT)
             AS jac_ppm,
           CAST(1000000 * e.matches // 6
                - 1000000 * i.n_inter // (sa.n + sb.n - i.n_inter) AS BIGINT)
             AS err_ppm
    FROM est e
    JOIN inter i ON i.a = e.a AND i.b = e.b
    JOIN sizes sa ON sa.id = e.a
    JOIN sizes sb ON sb.id = e.b
    """.format(corpus=_MINHASH_AUDIT_CORPUS),
)
def dedup_minhash_estimate_audit_q(spark, sf_dir):
    """Estimator-quality audit for the MinHash pipeline — for every LSH
    candidate pair, the signature-agreement estimate (matches/6 as ppm)
    NEXT TO the exact shingle Jaccard it estimates, plus the signed error
    — the recall-audit doctrine (`similarity_*_recall`) applied to the
    dedup rung: "6 hashes, 3 bands" stops being a config and becomes
    measured evidence (planted exact dups show matches=6, err 0; chance
    collisions show their true overlap).  Every term integer: match
    counts, shingle-set sizes, truncating ppm.

    100 TB shape: candidates come from the band join (never all-pairs —
    the audit only prices pairs the production pipeline would surface);
    the exact-Jaccard refinement is a shingle equi-join on candidate ids,
    the `dedup_containment` shape; signatures join back keyed on id."""
    from ..operators.dedup import minhash_band_keys, minhash_signatures, shingles

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 60).unionByName(
        docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    sh = shingles(corpus, "text", "doc_id", width=5, prefix_len=60, distinct=True)
    sh = sh.localCheckpoint(eager=True)  # feeds sigs, sizes, and the exact join
    sigs = minhash_signatures(sh, n_hashes=6)
    bands = minhash_band_keys(sigs, n_hashes=6, n_bands=3)
    pairs = (
        bands.alias("x")
        .join(bands.alias("y"), on="band_key")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("a"), *[F.col(f"sig_{k}").alias(f"a{k}") for k in range(6)])
    sb = sigs.select(F.col("id").alias("b"), *[F.col(f"sig_{k}").alias(f"b{k}") for k in range(6)])
    matches = sum(
        (F.col(f"a{k}") == F.col(f"b{k}")).cast("long") for k in range(6)
    )
    est = pairs.join(sa, "a").join(sb, "b").select(
        "a", "b", matches.cast("long").alias("matches")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return (
        est.join(inter, ["a", "b"])
        .join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            "matches",
            F.expr("CAST(1000000 * matches DIV 6 AS BIGINT)").alias("est_ppm"),
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter"))
            .cast("long")
            .alias("n_union"),
            F.expr(
                "CAST(1000000 * n_inter DIV (na + nb - n_inter) AS BIGINT)"
            ).alias("jac_ppm"),
            F.expr(
                "CAST(1000000 * matches DIV 6"
                " - 1000000 * n_inter DIV (na + nb - n_inter) AS BIGINT)"
            ).alias("err_ppm"),
        )
    )


# --------------------------------------------------------------------------
# sample_negatives_hash — deterministic contrastive negative sampling
# --------------------------------------------------------------------------
@register(
    "sample_negatives_hash",
    oracle="""
    WITH n_docs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    ),
    anchors AS (SELECT doc_id FROM documents),
    raw AS (
      SELECT a.doc_id AS anchor, k.k,
             ('0x' || substring(md5(CAST(a.doc_id AS VARCHAR) || '|'
                                    || CAST(k.k AS VARCHAR)), 1, 8))::BIGINT
               % nd.n AS pick,
             nd.n AS n
      FROM anchors a CROSS JOIN n_docs nd, generate_series(0, 3) k(k)
    )
    SELECT CAST(anchor AS BIGINT) AS anchor, CAST(k AS BIGINT) AS k,
           CAST(CASE WHEN pick = anchor THEN (pick + 1) % n
                     ELSE pick END AS BIGINT) AS neg_id
    FROM raw
    """,
)
def sample_negatives_hash_q(spark, sf_dir):
    """Deterministic contrastive negative sampling: each document draws
    K=4 pseudo-random negatives as md5(anchor|k) mod N over the DENSE
    doc_id space, with a +1 shift when the draw hits the anchor itself —
    the training-pair miner behind contrastive/embedding objectives,
    made a pure function of (anchor, k, N) so shards regenerate
    identically under retries and the pairing is exactly oracle-checkable
    (the `sample_split_hash` no-RNG doctrine applied to pair mining).

    Density contract: doc_id must be the dense [0, N) key (true of the
    synthetic corpus; production runs `zipWithIndex`-style dense ranking
    first or the modulus picks non-existent ids).

    100 TB shape: corpus-linear generate (a 4-way explode per anchor), no
    join at all — the negative is an ID, not a row lookup; downstream
    joins it against the (bucketed) corpus when materializing pair text.
    The count is ONE broadcast row."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    raw = (
        docs.crossJoin(F.broadcast(nd))
        .select(
            F.col("doc_id").alias("anchor"),
            "n",
            F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("k"),
        )
        .select(
            "anchor",
            F.col("k").cast("long").alias("k"),
            "n",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.col("anchor"), F.col("k"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            ).alias("pick"),
        )
    )
    return raw.select(
        "anchor",
        "k",
        F.when(F.col("pick") == F.col("anchor"), (F.col("pick") + 1) % F.col("n"))
        .otherwise(F.col("pick"))
        .cast("long")
        .alias("neg_id"),
    )


# --------------------------------------------------------------------------
# dedup_phonetic_blocking — the third classic ER blocker
# --------------------------------------------------------------------------
# One phonetic-key rule chain rendered to both dialects (the stemmer's
# dual-dialect doctrine): NOT Oracle soundex — a documented simplified key
# (consonant classes, vowel/hw removal, repeat collapse, 3-digit pad) that
# both engines compute identically.
_PHONETIC_CLASSES = [
    ("[bfpv]", "1"),
    ("[cgjkqsxz]", "2"),
    ("[dt]", "3"),
    ("[l]", "4"),
    ("[mn]", "5"),
    ("[r]", "6"),
]


def _phonetic_sql_duck(expr: str) -> str:
    digits = expr
    for pat, rep in _PHONETIC_CLASSES:
        digits = f"regexp_replace({digits}, '{pat}', '{rep}', 'g')"
    digits = f"regexp_replace({digits}, '[aeiouyhw]', '', 'g')"
    # DuckDB's RE2 has NO pattern backreferences — '(.)\\1+' silently
    # matches nothing — so repeats collapse via six literal-digit rules
    # (the post-vowel-removal alphabet is exactly 1-6).
    for d in "123456":
        digits = f"regexp_replace({digits}, '{d}{d}+', '{d}', 'g')"
    return f"substr({expr}, 1, 1) || rpad(substr({digits}, 2, 3), 3, '0')"


@register(
    "dedup_phonetic_blocking",
    oracle="""
    WITH corpus AS ({corpus}),
    norm AS (
      SELECT doc_id, lower(trim(text)) AS t,
             regexp_extract(lower(text), '[a-z]+', 0) AS tok
      FROM corpus
    ),
    keyed AS (
      SELECT doc_id, t, {key} AS pkey FROM norm WHERE tok <> ''
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
           a.pkey,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
    FROM keyed a JOIN keyed b ON a.pkey = b.pkey AND a.doc_id < b.doc_id
    WHERE levenshtein(a.t, b.t) <= 4
    """.format(corpus=_SNM_CORPUS_SQL, key=_phonetic_sql_duck("tok")),
)
def dedup_phonetic_blocking_q(spark, sf_dir):
    """Phonetic-key ER blocking — the THIRD classic blocker beside the
    prefix bucket (`dedup_fuzzy_levenshtein`) and the sorted window
    (`dedup_sorted_neighborhood`): records block on a simplified phonetic
    key of their first token (consonant classes -> vowel/h/w removal ->
    repeat collapse -> first-letter + 3 digits), so spelling variants
    that CHANGE early characters but keep the sound ('smith'/'smyth')
    land in one block where both lexical blockers miss.  The key is one
    rule chain rendered to BOTH dialects (the `text_search_stemmed`
    dual-dialect doctrine) — deliberately a documented simplified key,
    not engine-native soundex (DuckDB has none, and Spark's soundex would
    be a one-engine black box the oracle could not replay).

    100 TB shape: key assignment is a pure codegen projection; the block
    join keys on the 4-char key (block sizes are the skew risk — the
    production run caps blocks like the LSH stop-template cap); exact
    levenshtein refine only within blocks."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 300)
    edited = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    corpus = base.unionByName(edited).select(
        "doc_id",
        F.lower(F.trim(F.col("text"))).alias("t"),
        F.regexp_extract(F.lower("text"), "[a-z]+", 0).alias("tok"),
    ).filter(F.col("tok") != "")
    digits = F.col("tok")
    for pat, rep in _PHONETIC_CLASSES:
        digits = F.regexp_replace(digits, pat, rep)
    digits = F.regexp_replace(digits, "[aeiouyhw]", "")
    # same six literal collapse rules as the oracle (RE2 backref limit)
    for d in "123456":
        digits = F.regexp_replace(digits, d + d + "+", d)
    keyed = corpus.select(
        "doc_id",
        "t",
        F.concat(
            F.substring("tok", 1, 1),
            F.rpad(F.substring(digits, 2, 3), 3, "0"),
        ).alias("pkey"),
    )
    a = keyed.select(
        F.col("doc_id").alias("id_a"), F.col("t").alias("ta"), "pkey"
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"), F.col("t").alias("tb"), "pkey"
    )
    return (
        a.join(b, "pkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("ta", "tb") <= 4)
        .select(
            "id_a",
            "id_b",
            "pkey",
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
        )
    )


# --------------------------------------------------------------------------
# dedup_lsh_banding_audit — the S-curve, measured
# --------------------------------------------------------------------------
_LSH_AUDIT_CORPUS = """
    SELECT doc_id, text FROM documents WHERE doc_id < 70
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 10
"""

# (label, n_bands, rows_per_band) over the shared 6-hash signature
_LSH_CONFIGS = [("b1r6", 1, 6), ("b2r3", 2, 3), ("b3r2", 3, 2), ("b6r1", 6, 1)]


def _lsh_audit_oracle() -> str:
    head = """
    WITH corpus AS ({corpus}),
    sh AS (
      SELECT DISTINCT doc_id AS id, substring(substring(text, 1, 60), i, 5) AS shingle
      FROM corpus, generate_series(1, 56) t(i)
      WHERE i <= greatest(length(substring(text, 1, 60)) - 4, 0)
    ),
    hs AS (
      SELECT id,
             ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h1,
             ('0x' || substring(md5(shingle), 9, 8))::BIGINT AS h2
      FROM sh
    ),
    sigs AS (
      SELECT id,
        MIN(h1 + 0 * h2) AS sig_0, MIN(h1 + 1 * h2) AS sig_1,
        MIN(h1 + 2 * h2) AS sig_2, MIN(h1 + 3 * h2) AS sig_3,
        MIN(h1 + 4 * h2) AS sig_4, MIN(h1 + 5 * h2) AS sig_5
      FROM hs GROUP BY id
    ),
    sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT x.id AS a, y.id AS b, CAST(COUNT(*) AS BIGINT) AS ni
      FROM sh x JOIN sh y ON y.shingle = x.shingle AND x.id < y.id
      GROUP BY x.id, y.id
    ),
    truth AS (
      SELECT i.a, i.b FROM inter i
      JOIN sizes sa ON sa.id = i.a JOIN sizes sb ON sb.id = i.b
      WHERE 2 * i.ni >= sa.n + sb.n - i.ni
    ),
    n_truth AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM truth)""".format(
        corpus=_LSH_AUDIT_CORPUS
    )
    parts, selects = [head], []
    for label, b, r in _LSH_CONFIGS:
        band_rows = []
        for bi in range(b):
            members = " || '|' || ".join(
                f"CAST(sig_{bi * r + k} AS VARCHAR)" for k in range(r)
            )
            band_rows.append(
                f"SELECT id, md5('{bi}' || '|' || {members}) AS band_key FROM sigs"
            )
        parts.append(
            f""",
    bands_{label} AS ({' UNION ALL '.join(band_rows)}),
    cand_{label} AS (
      SELECT DISTINCT x.id AS a, y.id AS b
      FROM bands_{label} x JOIN bands_{label} y
        ON x.band_key = y.band_key AND x.id < y.id
    ),
    m_{label} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
             CAST(SUM(CASE WHEN t.a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits
      FROM cand_{label} c
      LEFT JOIN truth t ON t.a = c.a AND t.b = c.b
    )"""
        )
        selects.append(
            f"""
    SELECT '{label}' AS config, n_cand, n_hits, nt AS n_truth,
           CAST(CASE WHEN n_cand > 0 THEN 1000000 * n_hits // n_cand
                     ELSE 0 END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN nt > 0 THEN 1000000 * n_hits // nt
                     ELSE 0 END AS BIGINT) AS recall_ppm
    FROM m_{label}, n_truth"""
        )
    return "".join(parts) + " UNION ALL ".join(selects)


@register("dedup_lsh_banding_audit", oracle=_lsh_audit_oracle())
def dedup_lsh_banding_audit_q(spark, sf_dir):
    """LSH banding-sensitivity audit: the SAME 6-hash MinHash signature
    sliced four ways — (1 band x 6 rows) ... (6 bands x 1 row) — with
    measured candidate count, precision, and recall against exact
    ground truth (shingle Jaccard >= 1/2, the 2*inter >= union integer
    test) on a bounded audit sample.  This is the S-curve as evidence:
    more bands / shorter bands -> recall rises, precision falls; the
    production (3x2) choice stops being folklore (the
    `dedup_minhash_estimate_audit` doctrine applied to the BANDING knob
    rather than the estimator).

    100 TB shape: the ground truth is all-pairs BY DESIGN, on an
    audit-tier sample (80 docs here; production audits a fixed-size
    hash-sampled subset) — candidates themselves always come from band
    joins; signatures are computed ONCE and every config re-slices the
    same 6 columns (zero extra digest work)."""
    from ..operators.dedup import minhash_band_keys, minhash_signatures, shingles

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 70).unionByName(
        docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    sh = shingles(corpus, "text", "doc_id", width=5, prefix_len=60, distinct=True)
    sh = sh.localCheckpoint(eager=True)
    sigs = minhash_signatures(sh, n_hashes=6).localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        sh.select(F.col("id").alias("a"), "shingle")
        .join(sh.select(F.col("id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("ni"))
    )
    truth = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .filter(2 * F.col("ni") >= F.col("na") + F.col("nb") - F.col("ni"))
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    outs = []
    for label, b, r in _LSH_CONFIGS:
        bands = minhash_band_keys(sigs, n_hashes=b * r, n_bands=b)
        cand = (
            bands.alias("x")
            .join(bands.alias("y"), "band_key")
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .distinct()
        )
        m = cand.join(truth.withColumn("hit", F.lit(1)), ["a", "b"], "left").agg(
            F.count(F.lit(1)).cast("long").alias("n_cand"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        outs.append(
            m.crossJoin(F.broadcast(n_truth)).select(
                F.lit(label).alias("config"),
                "n_cand",
                "n_hits",
                F.col("nt").alias("n_truth"),
                F.expr(
                    "CAST(CASE WHEN n_cand > 0 THEN 1000000 * n_hits DIV n_cand"
                    " ELSE 0 END AS BIGINT)"
                ).alias("precision_ppm"),
                F.expr(
                    "CAST(CASE WHEN nt > 0 THEN 1000000 * n_hits DIV nt"
                    " ELSE 0 END AS BIGINT)"
                ).alias("recall_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --------------------------------------------------------------------------
# quality_duplication_scorecard — corpus dup-rate summary
# --------------------------------------------------------------------------
@register(
    "quality_duplication_scorecard",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 40
    ),
    groups AS (
      SELECT sha256(text) AS h, CAST(COUNT(*) AS BIGINT) AS n
      FROM corpus GROUP BY sha256(text)
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(n - 1) AS BIGINT) AS n_redundant,
           CAST(MAX(n) AS BIGINT) AS max_copies,
           CAST(1000000 * SUM(n - 1) // SUM(n) AS BIGINT) AS redundant_ppm
    FROM groups
    """,
)
def quality_duplication_scorecard_q(spark, sf_dir):
    """One-row corpus duplication scorecard: total docs, distinct
    contents, redundant copies (rows an exact dedup would remove), the
    largest duplicate group, and the redundancy share in ppm — the
    before/after number every dedup run reports (planted copies of 40
    docs make the gate's expected redundancy exact).  This is the
    SUMMARY tier above `dedup_exact_hash`'s per-group detail — the
    scorecard a pipeline logs per corpus version.

    100 TB shape: one digest hash agg (the exchange carries 32-byte
    digests + counters), then a 5-counter global fold over the
    group-cardinality frame."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 40).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    groups = corpus.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return groups.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("n") - 1).cast("long").alias("n_redundant"),
        F.max("n").cast("long").alias("max_copies"),
        F.expr("CAST(1000000 * sum(n - 1) DIV sum(n) AS BIGINT)").alias(
            "redundant_ppm"
        ),
    )


# --------------------------------------------------------------------------
# dedup_exact_normalized — near-exact dedup after canonical text cleanup
# --------------------------------------------------------------------------
@register(
    "dedup_exact_normalized",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000, upper(text) FROM documents WHERE doc_id < 15
      UNION ALL
      SELECT doc_id + 20000, text || '   ' FROM documents WHERE doc_id < 15
    ),
    norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                    '[.,!?;:''"()]', '', 'g'), '\\s+', ' ', 'g')) AS t
      FROM corpus
    )
    SELECT sha256(t) AS norm_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM norm GROUP BY sha256(t)
    """,
)
def dedup_exact_normalized_q(spark, sf_dir):
    """Normalized-exact dedup — the tier between byte-exact
    (`dedup_exact_hash`) and fuzzy: lowercase, strip punctuation,
    collapse whitespace, THEN hash — catching the case/spacing/
    punctuation variants that dominate real crawl duplicates (the C4
    cleanup observation) at exact-dedup cost, no candidate generation at
    all.  Planted uppercase and trailing-whitespace copies make the gate
    count them as duplicates where the byte-exact tier would not.

    100 TB shape: the normalizer is a codegen regexp chain riding the
    scan; thereafter identical to exact dedup — ONE digest hash
    aggregate, uniform keys."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 15).select(
            (F.col("doc_id") + 10000).alias("doc_id"), F.upper("text").alias("text")
        )
    ).unionByName(
        docs.filter(F.col("doc_id") < 15).select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.concat(F.col("text"), F.lit("   ")).alias("text"),
        )
    )
    norm = corpus.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[.,!?;:'\"()]", ""), r"\s+", " "
            )
        ).alias("t"),
    )
    return norm.groupBy(F.sha2("t", 256).alias("norm_hash")).agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )


# --------------------------------------------------------------------------
# pairs_contrastive_dataset — assembled positive/negative training pairs
# --------------------------------------------------------------------------
@register(
    "pairs_contrastive_dataset",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 30
    ),
    hashed AS (SELECT doc_id, sha256(text) AS h FROM corpus),
    groups AS (
      SELECT h, MIN(doc_id) AS rep, CAST(COUNT(*) AS BIGINT) AS sz
      FROM hashed GROUP BY h
    ),
    positives AS (
      SELECT g.rep AS anchor, x.doc_id AS partner, 1 AS label
      FROM groups g JOIN hashed x ON x.h = g.h AND x.doc_id <> g.rep
    ),
    n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM corpus),
    anchors AS (SELECT DISTINCT anchor FROM positives),
    ranked AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS pos
      FROM corpus
    ),
    neg_draws AS (
      SELECT a.anchor, k.k,
             ('0x' || substring(md5(CAST(a.anchor AS VARCHAR) || '|'
                                    || CAST(k.k AS VARCHAR) || '|cp'), 1, 8))::BIGINT
               % nd.n AS pick
      FROM anchors a CROSS JOIN n_docs nd, generate_series(0, 1) k(k)
    ),
    negatives AS (
      SELECT d.anchor, r.doc_id AS partner, 0 AS label
      FROM neg_draws d
      JOIN ranked r ON r.pos = d.pick
      JOIN hashed ha ON ha.doc_id = d.anchor
      JOIN hashed hp ON hp.doc_id = r.doc_id
      WHERE ha.h <> hp.h
    )
    SELECT CAST(anchor AS BIGINT) AS anchor, CAST(partner AS BIGINT) AS partner,
           CAST(label AS BIGINT) AS label
    FROM positives
    UNION ALL
    SELECT CAST(anchor AS BIGINT), CAST(partner AS BIGINT), CAST(label AS BIGINT)
    FROM negatives
    """,
)
def pairs_contrastive_dataset_q(spark, sf_dir):
    """Contrastive training-pair assembly — the dataset constructor that
    composes the repo's primitives into (anchor, partner, label) rows:
    POSITIVES are within-duplicate-group pairs (each content group's
    min-id representative paired with its copies — the `dedup_exact_hash`
    groups turned into supervision), NEGATIVES are md5-ring draws per
    anchor (the `sample_negatives_hash` machinery, here over a dense
    RANK of the corpus rather than raw ids) with same-content draws
    rejected — a negative that is secretly a positive is the classic
    label-noise bug, filtered by hash equality, not id equality.

    100 TB shape: positives ride the dedup digest aggregate; negative
    draws are corpus-linear; the rank table is one sort; every join is
    keyed.  Hard-negative upgrades (draw from the anchor's LSH bucket
    instead of the whole ring) compose on the same skeleton."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 200).unionByName(
        docs.filter(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    ).localCheckpoint(eager=True)
    hashed = corpus.select("doc_id", F.sha2("text", 256).alias("h")).localCheckpoint(
        eager=True
    )
    groups = hashed.groupBy("h").agg(
        F.min("doc_id").alias("rep"), F.count(F.lit(1)).cast("long").alias("sz")
    )
    positives = (
        groups.join(hashed, "h")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(
            F.col("rep").alias("anchor"),
            F.col("doc_id").alias("partner"),
            F.lit(1).cast("long").alias("label"),
        )
    )
    nd = corpus.agg(F.count(F.lit(1)).cast("long").alias("n"))
    anchors = positives.select("anchor").distinct()
    ranked = corpus.select(
        "doc_id", (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("pos")
    )
    neg_draws = (
        anchors.crossJoin(F.broadcast(nd))
        .select(
            "anchor",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("k"),
            "n",
        )
        .select(
            "anchor",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.col("anchor"), F.col("k"), F.lit("cp"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            ).alias("pick"),
        )
    )
    negatives = (
        neg_draws.join(ranked, neg_draws.pick == ranked.pos)
        .select("anchor", F.col("doc_id").alias("partner"))
        .join(hashed.select(F.col("doc_id").alias("anchor"), F.col("h").alias("ha")), "anchor")
        .join(hashed.select(F.col("doc_id").alias("partner"), F.col("h").alias("hp")), "partner")
        .filter(F.col("ha") != F.col("hp"))
        .select("anchor", "partner", F.lit(0).cast("long").alias("label"))
    )
    return positives.unionByName(negatives)


# --------------------------------------------------------------------------
# dedup_cluster_size_profile — the post-clustering sanity histogram
# --------------------------------------------------------------------------
@register(
    "dedup_cluster_size_profile",
    oracle="""
    WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
    pairs AS (
      SELECT doc_id AS a, doc_id + 10000 AS b FROM ids WHERE doc_id < 30
      UNION ALL
      SELECT doc_id + 10000, doc_id + 20000 FROM ids WHERE doc_id < 15
      UNION ALL
      SELECT doc_id + 20000, doc_id + 30000 FROM ids WHERE doc_id < 5
    ),
    sym AS (
      SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
    ),
    reach AS (
      SELECT x AS node, x AS r FROM sym
      UNION
      SELECT s.x, reach.r FROM sym s JOIN reach ON reach.node = s.y
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    sizes AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
      FROM comp GROUP BY component
    )
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_members
    FROM sizes GROUP BY sz
    """,
)
def dedup_cluster_size_profile_q(spark, sf_dir):
    """Duplicate-cluster size histogram — the sanity check every
    clustering dedup run reads FIRST: a healthy near-dup graph yields
    many small clusters; one giant component means the candidate
    generator (LSH bands too aggressive, shingle width too small)
    glued the corpus together and keep-one-per-group is about to delete
    it.  Runs the same min-label closure as `dedup_connected_components`
    over the planted chain graph (sizes 2, 3, and 4 by construction) and
    histograms the component sizes.

    100 TB shape: closure cost is the components operator's (documented
    there); the histogram is two tiny hash aggs on top — the profile is
    effectively free relative to the closure it audits."""
    from ..plans.graph_query import connected_components

    ids = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))
    link = lambda n, off_a, off_b: ids.filter(F.col("doc_id") < n).select(  # noqa: E731
        (F.col("doc_id") + off_a).alias("a"), (F.col("doc_id") + off_b).alias("b")
    )
    pairs = link(30, 0, 10000).unionByName(link(15, 10000, 20000)).unionByName(
        link(5, 20000, 30000)
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_members"),
    )


# --------------------------------------------------------------------------
# dedup_blocker_union_audit — the three ER blockers, unioned with provenance
# --------------------------------------------------------------------------
@register(
    "dedup_blocker_union_audit",
    oracle="""
    WITH corpus AS ({corpus}),
    norm AS (
      SELECT doc_id, lower(trim(text)) AS t,
             substr(lower(trim(text)), 1, 12) AS pfx,
             regexp_extract(lower(text), '[a-z]+', 0) AS tok
      FROM corpus
    ),
    prefix_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM norm a JOIN norm b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
      WHERE levenshtein(a.t, b.t) <= 4
    ),
    ranked AS (
      SELECT doc_id, t, row_number() OVER (ORDER BY t, doc_id) AS rnk
      FROM norm
    ),
    window_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ranked a JOIN ranked b
        ON b.rnk > a.rnk AND b.rnk <= a.rnk + 10
      WHERE levenshtein(a.t, b.t) <= 4
    ),
    keyed AS (
      SELECT doc_id, t, {pkey} AS pkey FROM norm WHERE tok <> ''
    ),
    phonetic_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM keyed a JOIN keyed b ON a.pkey = b.pkey AND a.doc_id < b.doc_id
      WHERE levenshtein(a.t, b.t) <= 4
    ),
    unioned AS (
      SELECT id_a, id_b, 1 AS by_prefix, 0 AS by_window, 0 AS by_phonetic
      FROM prefix_pairs
      UNION ALL
      SELECT id_a, id_b, 0, 1, 0 FROM window_pairs
      UNION ALL
      SELECT id_a, id_b, 0, 0, 1 FROM phonetic_pairs
    ),
    merged AS (
      SELECT id_a, id_b,
             CAST(MAX(by_prefix) AS BIGINT) AS by_prefix,
             CAST(MAX(by_window) AS BIGINT) AS by_window,
             CAST(MAX(by_phonetic) AS BIGINT) AS by_phonetic
      FROM unioned GROUP BY id_a, id_b
    )
    SELECT CAST(by_prefix AS BIGINT) AS by_prefix,
           CAST(by_window AS BIGINT) AS by_window,
           CAST(by_phonetic AS BIGINT) AS by_phonetic,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM merged GROUP BY by_prefix, by_window, by_phonetic
    """.format(corpus=_SNM_CORPUS_SQL, pkey=_phonetic_sql_duck("tok")),
)
def dedup_blocker_union_audit_q(spark, sf_dir):
    """The three-blocker union, audited: every near-dup pair (levenshtein
    <= 4 on the shared planted-edit corpus) found by the prefix bucket,
    the sorted window, or the phonetic key, rolled up by PROVENANCE
    PATTERN — the 7-cell census that turns 'production ER runs several
    blockers and unions' from folklore into a measured coverage claim
    (cells with exactly one flag set are pairs the other two blockers
    MISS; an empty single-blocker cell would mean that blocker is
    redundant on this corpus).  The `dedup_lsh_banding_audit` doctrine
    applied across blocker FAMILIES instead of within one family's knob.

    100 TB shape: each blocker keeps its own documented candidate
    economics; the union is a (pair)-keyed MAX-merge of flag rows —
    candidates only, never all-pairs; the census is an 8-cell map-side
    fold."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 300)
    edited = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    norm = base.unionByName(edited).select(
        "doc_id",
        F.lower(F.trim(F.col("text"))).alias("t"),
        F.substring(F.lower(F.trim(F.col("text"))), 1, 12).alias("pfx"),
        F.regexp_extract(F.lower("text"), "[a-z]+", 0).alias("tok"),
    ).localCheckpoint(eager=True)

    a_cols = lambda df, extra: df.select(  # noqa: E731
        F.col("doc_id").alias("id_a"), F.col("t").alias("ta"), *extra
    )
    b_cols = lambda df, extra: df.select(  # noqa: E731
        F.col("doc_id").alias("id_b"), F.col("t").alias("tb"), *extra
    )
    lev_ok = F.levenshtein("ta", "tb") <= 4

    prefix_pairs = (
        a_cols(norm, [F.col("pfx")])
        .join(b_cols(norm, [F.col("pfx")]), "pfx")
        .filter((F.col("id_a") < F.col("id_b")) & lev_ok)
        .select("id_a", "id_b")
    )
    ranked = norm.select(
        "doc_id", "t", F.row_number().over(Window.orderBy("t", "doc_id")).alias("rnk")
    )
    w = 10
    left = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.col("t").alias("ta"),
        F.col("rnk").alias("ra"),
        F.explode(
            F.array((F.col("rnk") / w).cast("long"), (F.col("rnk") / w + 1).cast("long"))
        ).alias("bucket"),
    )
    right = ranked.select(
        F.col("doc_id").alias("id_b"),
        F.col("t").alias("tb"),
        F.col("rnk").alias("rb"),
        (F.col("rnk") / w).cast("long").alias("bucket"),
    )
    window_pairs = (
        left.join(right, "bucket")
        .filter((F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + w) & lev_ok)
        .select("id_a", "id_b")
    )
    digits = F.col("tok")
    for pat, rep in _PHONETIC_CLASSES:
        digits = F.regexp_replace(digits, pat, rep)
    digits = F.regexp_replace(digits, "[aeiouyhw]", "")
    for d in "123456":
        digits = F.regexp_replace(digits, d + d + "+", d)
    keyed = norm.filter(F.col("tok") != "").select(
        "doc_id",
        "t",
        F.concat(
            F.substring("tok", 1, 1), F.rpad(F.substring(digits, 2, 3), 3, "0")
        ).alias("pkey"),
    )
    phonetic_pairs = (
        a_cols(keyed, [F.col("pkey")])
        .join(b_cols(keyed, [F.col("pkey")]), "pkey")
        .filter((F.col("id_a") < F.col("id_b")) & lev_ok)
        .select("id_a", "id_b")
    )

    def tag(df, p, wdw, ph):
        return df.select(
            "id_a",
            "id_b",
            F.lit(p).cast("long").alias("by_prefix"),
            F.lit(wdw).cast("long").alias("by_window"),
            F.lit(ph).cast("long").alias("by_phonetic"),
        )

    unioned = (
        tag(prefix_pairs, 1, 0, 0)
        .unionByName(tag(window_pairs, 0, 1, 0))
        .unionByName(tag(phonetic_pairs, 0, 0, 1))
    )
    merged = unioned.groupBy("id_a", "id_b").agg(
        F.max("by_prefix").cast("long").alias("by_prefix"),
        F.max("by_window").cast("long").alias("by_window"),
        F.max("by_phonetic").cast("long").alias("by_phonetic"),
    )
    return merged.groupBy("by_prefix", "by_window", "by_phonetic").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


