"""Trained quality-classifier tier (VERDICT r8 ask #2) — the model-based
filter every production corpus pipeline runs on top of its heuristic
gates (CCNet's fastText LM filter, Joulin et al. 2016; DCLM's fastText
quality classifier, Li et al. 2024 §4.2; FineWeb-Edu's scored filter,
Penedo et al. 2024): a linear classifier over HASHED token n-gram
features, trained on labeled examples, whose score ranks/filters the
corpus where `gopher_filter` only gates it.

Spark-first split of concerns:

* **Feature space** — unigram + bigram tokens hash into ``n_features``
  bins with the SAME sha-based hash family as CMS/minhash
  (``dedup._sha_bigint``), NOT MLlib's Murmur3 ``HashingTF``: the bin
  index must be computable in the DuckDB oracle, and the sha family is
  the repo's established cross-engine hash. The hashing trick itself is
  exactly fastText's (Joulin et al. 2016 §2.1) / MLlib HashingTF's.
* **Training** — :func:`train_quality_classifier` assembles per-doc
  sparse vectors and fits ``pyspark.ml.classification
  .LogisticRegression`` (L-BFGS). Training runs once per model on the
  LABELED set (thousands of rows, never the corpus), so its cost is
  irrelevant at 100 TB; coefficients export micro-quantized
  (``round(w·1e6)`` bigints — the dsir_weights integer discipline at
  textstats.py:1259) so scoring is order-free integer math.
* **Serving** — :func:`quality_classifier_scores` is the 100 TB path:
  one token explode → hash to bin → join the BROADCAST (idx, w_q)
  model table (≤ ``n_features`` rows) → one id-keyed integer sum.
  Map-side partial aggregation, no corpus-sized shuffle beyond the
  per-doc sum, nothing driver-proportional, no Python in the plan.

The shipped :data:`QC_PINNED_MODEL` is ``train_quality_classifier`` run
on :func:`fixture_quality_labels` (deterministic: single-partition fit,
zero initialization, no sampling — re-training reproduces it bit-exactly,
unit-pinned). Real deployments retrain on their own labels; the serving
plan is identical for any model dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connapse_spark.functions.text import sql_tokens_exact, tokens_exact_expr
from connapse_spark.operators.dedup import _sha_bigint, sql_sha_bigint

QC_N_FEATURES = 512  # hashing-trick bins; scale freely — the model stays a broadcast table


def hashed_ngram_features(
    docs: DataFrame,
    n_features: int = QC_N_FEATURES,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, idx, tf): unigram + bigram tokens hashed into ``n_features``
    bins (in-bin collisions sum, the standard hashing trick). Bigrams
    join with a space — the Unicode tokenizer admits no spaces inside a
    token, so the joined key is collision-free against unigrams of the
    same text. One explode + one (id, idx) aggregate; map-side partials."""
    toks = tokens_exact_expr(F.col(text_col))
    n_pairs = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_pairs), F.slice(toks, 2, n_pairs),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    terms = docs.select(
        F.col(id_col).alias("id"), F.explode(F.concat(toks, bigrams)).alias("term")
    )
    return (
        terms.select("id", (_sha_bigint(F.col("term")) % n_features).alias("idx"))
        .groupBy("id", "idx")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _sql_hashed_ngram_features(
    n_features: int = QC_N_FEATURES,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB mirror of :func:`hashed_ngram_features` (same slice-zip
    bigram construction as sql_bigram_perplexity, same sha bin hash)."""
    return f"""
base AS (SELECT {id_col} AS id, {sql_tokens_exact(text_col)} AS ts FROM {table}),
uni AS (SELECT id, unnest(ts) AS term FROM base),
bi AS (
  SELECT id, ts[i + 1] || ' ' || ts[i + 2] AS term
  FROM (SELECT id, ts, unnest(range(0, len(ts) - 1)) AS i FROM base WHERE len(ts) >= 2)
),
feats AS (
  SELECT id, ({sql_sha_bigint('term')} % {n_features}) AS idx, count(*) AS tf
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
  GROUP BY id, idx
)""".strip()


def train_quality_classifier(
    labeled: DataFrame,
    n_features: int = QC_N_FEATURES,
    max_iter: int = 60,
    reg_param: float = 1e-3,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    deterministic: bool = True,
) -> dict:
    """Fit MLlib LogisticRegression over the hashed n-gram features of a
    LABELED frame (label 1.0 = keep-quality, 0.0 = junk) and export
    ``{"n_features": n, "bias_q": int, "weights_q": {idx: int}}`` with
    micro-quantized coefficients (zero weights dropped — unseen bins
    score exactly 0).

    The labeled set is bounded by construction (human/LLM labels are
    expensive — DCLM trains on ~400k docs, CCNet on one Wikipedia dump).
    Two training tiers (r10 — VERDICT r9 ask #5):

    * ``deterministic=True`` (default) — the single-partition coalesce
      below buys bit determinism: L-BFGS over a fixed-order single
      partition with zero initialization and standardization off has no
      float-reduction or sampling nondeterminism, so retraining
      reproduces the exported constants exactly (unit-pinned for the
      shipped fixture model). Practical ceiling MEASURED in SCALING.md
      (§classifier-train): wall time grows linearly in labeled rows on
      the one partition — fine through the ~10⁴–10⁵ regime typical of
      curated label sets, minutes-not-hours at DCLM's 400k.
    * ``deterministic=False`` — the labeled frame keeps its natural
      partitioning and MLlib's stock ``treeAggregate`` L-BFGS reduces
      gradients across partitions in parallel — the tier for label sets
      that outgrow one partition. The L2-regularized objective is
      strictly convex (unique optimum), so the two tiers agree to
      optimizer tolerance, not bit-exactly; the micro-quantized exports
      differ by at most a few micro-units (tolerance-pinned in units).
      Retraining reproducibility weakens to the same tolerance.

    The per-row sparse-vector assembly is an RDD map — the one Python
    row path in this module, confined to the bounded TRAINING input;
    the serving path (:func:`quality_classifier_scores`) never leaves
    Catalyst."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors, VectorUDT
    from pyspark.sql.types import DoubleType, StructField, StructType

    feats = hashed_ngram_features(
        labeled, n_features=n_features, id_col=id_col, text_col=text_col
    )
    rows = (
        labeled.select(F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y"))
        .join(feats, "id", "left")
        .groupBy("id", "y")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("idx"), F.col("tf")))
            ).alias("pairs")
        )
    )
    if deterministic:
        # fixed row order → deterministic L-BFGS reduction
        rows = rows.orderBy("id").coalesce(1)
    nf = n_features
    train = rows.rdd.map(
        lambda r: (
            float(r["y"]),
            Vectors.sparse(
                nf,
                [int(p["idx"]) for p in r["pairs"] if p["idx"] is not None],
                [float(p["tf"]) for p in r["pairs"] if p["idx"] is not None],
            ),
        )
    ).toDF(
        StructType(
            [
                StructField("label", DoubleType()),
                StructField("features", VectorUDT()),
            ]
        )
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False, tol=1e-9
    )
    m = lr.fit(train)
    weights_q = {
        int(i): int(round(float(w) * 1e6))
        for i, w in enumerate(m.coefficients.toArray())
        if round(float(w) * 1e6) != 0
    }
    return {
        "n_features": n_features,
        "bias_q": int(round(float(m.intercept) * 1e6)),
        "weights_q": weights_q,
    }


def quality_classifier_scores(
    docs: DataFrame,
    model: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    map_side: bool = False,
) -> DataFrame:
    """Score every document with a trained model:
    ``logit_q = bias_q + Σ_bins tf·w_q`` (integer micro-logits, exact in
    any summation order), plus ``n_feats`` (total hashed term count) and
    the double ``logit`` (monotone in the class probability — the
    sigmoid is deliberately NOT applied, same reasoning as
    quality_score_linear: threshold sweeps are monotone and the oracle
    stays transcendental-free).

    Plan, two tiers, bit-equal (both are order-free integer sums) —
    pick by MEASUREMENT, not plan aesthetics:

    * default (broadcast tier) — token explode → broadcast (idx, w_q)
      join → one id-keyed sum → join-back for zero-token docs. Every
      stage is whole-stage codegen; the shuffles move (id, long) rows.
      Measured 0.44s at sf0.1 (best of 3). Works for any model size.
    * ``map_side=True`` (models ≤ 4096 bins) — the weight table embeds
      as ONE literal array and scoring is a per-row ``aggregate`` fold:
      ZERO shuffles, no joins — but Catalyst higher-order functions run
      INTERPRETED (the cdc_chunks column-tier lesson), so the fold
      measured 1.48s at sf0.1 — 3.4× the broadcast tier despite the
      cleaner plan. Opt in when shuffle capacity, not CPU, is the
      binding constraint (e.g. composing into an already
      shuffle-saturated stage); plan shape pinned by
      test_scoring_tiers_bit_equal_and_map_side.

    Docs with no tokens (or no model-weighted bins) score the bias."""
    mdl = QC_PINNED_MODEL if model is None else model
    n = int(mdl["n_features"])
    bias = F.lit(int(mdl["bias_q"]))
    if map_side and n > 4096:
        # map_side is an explicit shuffle-capacity request — silently
        # falling back to the two-shuffle join tier would violate the
        # very assumption the caller opted in for (r9 review)
        raise ValueError(
            f"map_side scoring embeds the weight table as plan literals and "
            f"is capped at 4096 bins (model has {n}); use the default "
            "broadcast tier or rehash to a smaller feature space"
        )
    if map_side:
        warr = [0] * n
        for i, w in mdl["weights_q"].items():
            warr[int(i)] = int(w)
        wlit = F.array(*[F.lit(w).cast("long") for w in warr])
        toks = tokens_exact_expr(F.col(text_col))
        n_pairs = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
        bigrams = F.zip_with(
            F.slice(toks, 1, n_pairs), F.slice(toks, 2, n_pairs),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        terms = F.coalesce(F.concat(toks, bigrams), F.array())
        s = F.aggregate(
            terms,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.element_at(wlit, (_sha_bigint(t) % n + 1).cast("int")),
        )
        logit_q = bias + s
        return docs.select(
            F.col(id_col),
            F.size(terms).cast("bigint").alias("n_feats"),
            logit_q.cast("bigint").alias("logit_q"),
            (logit_q.cast("double") / F.lit(1e6)).alias("logit"),
        )
    spark = docs.sparkSession
    # int() both halves: a model dict round-tripped through JSON carries
    # STRING bin keys, which the map-side tier and the SQL mirror already
    # tolerate — the join tier must too (r9 review)
    items = [(int(i), int(w)) for i, w in mdl["weights_q"].items()]
    wtab = F.broadcast(
        spark.createDataFrame(
            items or [(None, None)], "idx bigint, w_q bigint"
        ).filter(F.col("idx").isNotNull())
    )
    feats = hashed_ngram_features(
        docs, n_features=n, id_col=id_col, text_col=text_col
    )
    agg = (
        feats.join(wtab, "idx", "left")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_feats"),
            F.sum(F.col("tf") * F.coalesce(F.col("w_q"), F.lit(0))).alias("_s"),
        )
    )
    logit_q = bias + F.coalesce(F.col("_s"), F.lit(0))
    return docs.select(F.col(id_col).alias("id")).join(agg, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
        logit_q.cast("bigint").alias("logit_q"),
        (logit_q.cast("double") / F.lit(1e6)).alias("logit"),
    )


def sql_quality_classifier(
    model: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB mirror of :func:`quality_classifier_scores`: the model's
    nonzero (idx, w_q) rows inline as a VALUES table (≤ n_features rows),
    same hash, same integer sums, same bias fold."""
    mdl = QC_PINNED_MODEL if model is None else model
    items = sorted((int(i), int(w)) for i, w in mdl["weights_q"].items())
    vals = ", ".join(f"({i}, {w})" for i, w in items) or "(NULL, NULL)"
    feats = _sql_hashed_ngram_features(
        n_features=mdl["n_features"], id_col=id_col, text_col=text_col, table=table
    )
    bias = int(mdl["bias_q"])
    return f"""
WITH {feats},
model(idx, w_q) AS (VALUES {vals}),
agg AS (
  SELECT id, sum(tf) AS n_feats,
         sum(tf * coalesce(w_q, 0)) AS s
  FROM feats LEFT JOIN model USING (idx)
  GROUP BY id
)
SELECT d.{id_col},
       CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats,
       CAST({bias} + coalesce(s, 0) AS BIGINT) AS logit_q,
       CAST({bias} + coalesce(s, 0) AS DOUBLE) / 1000000.0 AS logit
FROM {table} d LEFT JOIN agg ON d.{id_col} = agg.id
""".strip()


def fixture_quality_labels(n_good: int = 150, n_bad: int = 150) -> list[tuple[int, float, str]]:
    """Deterministic labeled corpus for the shipped model: GOOD docs are
    stopword-rich English sentences over a small content vocabulary
    (what a quality classifier's positive class looks like after the
    Gopher gate); BAD docs are the failure modes heuristic gates
    under-catch — hex-gibberish salad, keyword-stuffing repetition, and
    boilerplate navigation fragments. Ids: good < 10000 ≤ bad."""
    import random

    rng = random.Random(20260816)
    subjects = ["the model", "a reader", "the committee", "our team", "the study",
                "this method", "the author", "a student", "the market", "the engine"]
    verbs = ["explains", "shows that", "considers", "improves", "describes",
             "evaluates", "compares", "summarizes", "questions", "measures"]
    objects = ["the results of the experiment", "a simple idea in plain words",
               "how the parts fit together", "what happened over the last year",
               "the trade between cost and speed", "why the first draft failed",
               "the evidence from both sources", "a clear path to the answer",
               "the history of the field", "an honest account of the work"]
    tails = ["It is written for a general audience.",
             "The argument builds slowly and carefully.",
             "Each section ends with a short summary.",
             "Nothing here requires prior knowledge.",
             "The conclusion follows from the data."]
    out: list[tuple[int, float, str]] = []
    for i in range(n_good):
        sents = [
            f"{rng.choice(subjects).capitalize()} {rng.choice(verbs)} {rng.choice(objects)}."
            for _ in range(rng.randint(3, 6))
        ]
        sents.append(rng.choice(tails))
        out.append((i, 1.0, " ".join(sents)))
    nav = ["home login register privacy terms contact sitemap faq",
           "click here click here subscribe now subscribe now buy buy buy",
           "copyright all rights reserved cookie settings accept decline"]
    for j in range(n_bad):
        mode = j % 3
        if mode == 0:  # hex-gibberish salad
            words = [f"{rng.getrandbits(32):08x}" for _ in range(rng.randint(20, 40))]
        elif mode == 1:  # keyword stuffing
            kw = rng.choice(["cheap", "deal", "casino", "pills", "win"])
            words = [kw, rng.choice(["best", "free", "now", "top"])] * rng.randint(10, 20)
        else:  # boilerplate fragments
            words = (rng.choice(nav) + " " + rng.choice(nav)).split()
        out.append((10_000 + j, 0.0, " ".join(words)))
    return out


# train_quality_classifier(fixture_quality_labels()) — regenerate with
# tools/pin_classifier.py; the unit test retrains and asserts equality.
QC_PINNED_MODEL: dict = {
    "n_features": 512,
    "bias_q": -6827393,
    "weights_q": {
        0: -4180, 1: -10659, 2: 179779, 3: 1983, 4: -86783, 5: 265892,
        6: -16804, 7: -15797, 8: 50720, 9: 21256, 10: -17825, 11: -21735,
        12: -19086, 13: 5321, 14: 104195, 15: -23354, 16: -8211, 17: -93300,
        18: -43199, 19: 29614, 20: 2521, 21: -22022, 22: -39559, 23: -32347,
        24: -17830, 25: -102138, 26: -13216, 27: -24861, 28: -8065, 29: -13386,
        30: 123, 31: -3953, 32: -44261, 33: -50275, 34: -27308, 35: 178618,
        36: -20153, 37: 66756, 38: -5264, 39: -16322, 40: -87104, 41: -32431,
        42: -41854, 43: 8024, 44: -20938, 45: -90825, 46: -20776, 47: -14809,
        48: -16732, 49: -20238, 50: -12746, 51: -27290, 52: 54144, 53: -54456,
        54: -5429, 55: 65742, 56: 51284, 57: -63771, 58: -28653, 59: -31578,
        60: -17651, 61: 22956, 62: 23600, 63: 93365, 64: -17707, 65: -11123,
        66: -20276, 67: -4433, 68: -13433, 69: 149905, 70: -17174, 71: 642,
        72: 49184, 73: -25243, 74: 2194, 75: -29382, 76: -25954, 77: -47375,
        78: -30051, 79: -14623, 80: -42331, 81: -23493, 82: -18891, 83: -35120,
        84: 42232, 85: -70993, 86: -20608, 87: 60503, 88: -32023, 89: -39855,
        90: -38107, 91: -14828, 92: -44478, 93: 84840, 94: 77734, 95: -35414,
        96: -4865, 97: -22799, 98: -24073, 99: -24552, 100: -26867, 101: 31908,
        102: -56397, 103: -10556, 104: -23946, 105: -29249, 106: -33798, 107: -10470,
        108: -25433, 109: 19638, 110: -27747, 111: -57579, 112: 8946, 113: -29233,
        114: -18937, 115: -21943, 116: -18532, 117: -13215, 118: 138840, 119: -24385,
        120: -20044, 121: 133144, 122: 58086, 123: -38209, 124: -28305, 125: -19289,
        126: 69486, 127: -43664, 128: -11818, 129: -21711, 130: -21587, 131: -34502,
        132: 90088, 133: -12002, 134: -7247, 135: -2215, 136: -29084, 137: 1826,
        138: 15350, 139: -19568, 140: -14803, 141: -18961, 142: -17470, 143: -8609,
        144: -28049, 145: 64556, 146: 165940, 147: -28753, 148: 71103, 149: -31085,
        150: -19707, 151: -23322, 152: 2203, 153: 24358, 154: -23781, 155: -28327,
        156: -46676, 157: -23388, 158: -32530, 159: -27825, 160: -37657, 161: -33421,
        162: -79942, 163: 64469, 164: -26214, 165: -41189, 166: -14987, 167: -30968,
        168: 1113, 169: -13660, 170: 51319, 171: -75461, 172: -27041, 173: 140995,
        174: -7060, 175: -32578, 176: 145898, 177: -38549, 178: -13343, 179: -8129,
        180: 118663, 181: -23154, 182: 63718, 183: -12045, 184: -23263, 185: 184778,
        186: 114555, 187: 26353, 188: -10281, 189: 65267, 190: -73204, 191: -5232,
        192: 54697, 193: -15543, 194: 15658, 195: 74987, 196: -18416, 197: -16372,
        198: -25930, 199: 111075, 200: -31248, 201: -11720, 202: -26861, 203: -30719,
        204: -76229, 205: -31299, 206: 11335, 207: -8998, 208: 114900, 209: -24463,
        210: -7016, 211: 40516, 212: -82, 213: -8271, 214: 91482, 215: 87167,
        216: 58383, 217: 8581, 218: -35417, 219: -65867, 220: -20840, 221: -20393,
        222: 202515, 223: -39173, 224: -22352, 225: 86345, 226: -23119, 227: 35598,
        228: -17525, 229: -27977, 230: -5105, 231: -98571, 232: -11125, 233: 5634,
        234: -36373, 235: -19259, 236: -34887, 237: -7653, 238: 7699, 239: 35599,
        240: -19772, 241: -39903, 242: -48767, 243: 1548, 244: -40341, 245: 403,
        246: -15543, 247: -52786, 248: -31857, 249: -32585, 250: -44670, 251: 152245,
        252: 160902, 253: 65705, 254: 104258, 255: -13138, 256: -51748, 257: -25388,
        258: -40985, 259: 65340, 260: 72469, 261: -65742, 262: -37179, 263: 23969,
        264: -72048, 265: 103606, 266: -33123, 267: -14133, 268: -16420, 269: -62368,
        270: -7438, 271: 19209, 272: 67095, 273: 40876, 274: 578200, 275: 44409,
        276: -13943, 277: 10130, 278: -17222, 279: -30276, 280: -5131, 281: -31692,
        282: -40101, 283: 126278, 284: -30182, 285: -21953, 286: -31439, 287: 3957,
        288: -74405, 289: 19656, 290: -39659, 291: -21181, 292: 176174, 293: -31623,
        294: -38934, 295: 20274, 296: -15971, 297: -20570, 298: -31522, 299: -14349,
        300: -2754, 301: -14969, 302: -2942, 303: -34814, 304: -25328, 305: -25990,
        306: 74292, 307: -15887, 308: -44267, 309: -69567, 310: 21480, 311: -40798,
        312: -50576, 313: -27691, 314: -10298, 315: 113153, 316: 45762, 317: -34088,
        318: -30520, 319: 39017, 320: 58799, 321: 1212, 322: -47339, 323: -27345,
        324: -30751, 325: -24690, 326: -27325, 327: -12965, 328: -33165, 329: 82388,
        330: -30604, 331: -17386, 332: -5730, 333: 106918, 334: -14682, 335: 84804,
        336: 27570, 337: 5551, 338: -10349, 339: 99866, 340: -65866, 341: -34642,
        342: -43773, 343: 40184, 344: -36680, 345: -55252, 346: 58075, 347: -25677,
        348: 71999, 349: -32949, 350: -13288, 351: -27353, 352: 2701, 353: -88507,
        354: -89544, 355: 55094, 356: 104083, 357: -153215, 358: -38152, 359: -1973,
        360: 692, 361: -12669, 362: -10908, 363: 11109, 364: -100376, 365: 23243,
        366: -48624, 367: -42998, 368: 45183, 369: -6616, 370: 33182, 371: -40938,
        372: 60692, 373: -31284, 374: 40505, 375: -22022, 376: -20590, 377: -36951,
        378: -21386, 379: 3861, 380: -25417, 381: 1301193, 382: -15556, 383: 50922,
        384: -148339, 385: 76062, 386: 145662, 387: -18912, 388: 9787, 389: -24301,
        390: 147225, 391: 81759, 392: -44505, 393: -7989, 394: -32788, 395: 57513,
        396: 2509, 397: -23143, 398: -13324, 399: 19576, 400: -11888, 401: -26173,
        402: -35687, 403: -67498, 404: -19557, 405: -113659, 406: 142049, 407: 96199,
        408: -25660, 409: -61789, 410: -20447, 411: 18776, 412: -12048, 413: 60121,
        414: -48696, 415: -43101, 416: -27541, 417: -5327, 418: -31037, 419: -183117,
        420: 42586, 421: -87148, 422: 87997, 423: -26027, 424: -6469, 425: -36304,
        426: -56814, 427: -51467, 428: -80697, 429: 65723, 430: -27742, 431: 51416,
        432: -26045, 433: 3362, 434: -24279, 435: 92087, 436: -37240, 437: -9501,
        438: 127573, 439: -96797, 440: -11822, 441: -29411, 442: -15184, 443: 36282,
        444: -16365, 445: 95026, 446: 43519, 447: 69126, 448: 167173, 449: -30242,
        450: -28201, 451: 87672, 452: -80422, 453: 101918, 454: 8564, 455: 13796,
        456: -46078, 457: 61829, 458: 17433, 459: -12224, 460: -40515, 461: 49088,
        462: 94689, 463: 160813, 464: -12095, 465: -16329, 466: 55092, 467: -16210,
        468: -22573, 469: -30328, 470: 77908, 471: -14798, 472: -32794, 473: -13072,
        474: -15890, 475: 34500, 476: 101174, 477: -25887, 478: -5737, 479: -25828,
        480: -4336, 481: -25033, 482: 263, 483: -4422, 484: -40680, 485: 2215,
        486: -18684, 487: 139215, 488: -47735, 489: -7174, 490: 58640, 491: -20227,
        492: -88026, 493: 45154, 494: -27695, 495: -10422, 496: -12818, 497: -34478,
        498: 87065, 499: 12070, 500: -61347, 501: -14191, 502: -17150, 503: 97967,
        504: 38397, 505: -13831, 506: -159985, 507: -21989, 508: -30011, 509: 54611,
        510: 8926, 511: -8359,
    },
}
