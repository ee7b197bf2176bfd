"""Attribute store — Dolma's architecture for corpus curation (Soldaini
et al. 2024): compute per-document SIGNALS once into a wide attribute
frame, persist it next to the corpus, and apply (re-apply, A/B, audit)
filter POLICIES as cheap predicates over the attributes — signal
computation is the expensive corpus-scale part, policy iteration should
never repeat it.

``doc_attributes`` assembles the engine's signal families into one
frame keyed by document id:

* Gopher rule battery + repetition battery (operators/quality.py) —
  single-scan projections/aggregations;
* PII counts (operators/pii.py) — single-scan projection;
* LM quality score (unigram or bigram, operators/quality.py) — the
  two-scan aggregation shape;
* learned-classifier score (operators/classifier.py) — featurize +
  broadcast join.

Each family is joined on the id (uniform key); families not requested
cost nothing. The result is the natural parquet artifact.

``apply_policy`` filters the CORPUS by named predicates over the
attribute frame and returns (kept, drop log with the FIRST failing
policy name per document, in the order given) — the same keep/drop-log
contract as clean_corpus, with the policy expressed as data, not code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def doc_attributes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gopher: bool = True,
    repetition: bool = True,
    pii: bool = True,
    lm: str | None = "unigram",
    classifier_model: tuple[DataFrame, float] | None = None,
    classifier_buckets: int = 4096,
    dup_density: bool = False,
    dup_density_n: int = 8,
) -> DataFrame:
    """One wide per-document signal frame. Joins are on the uniform id
    key and every family scans the corpus independently (persist the
    output — that is the point of the attribute-store pattern)."""
    out = docs.select(id_col)
    if gopher:
        from .quality import gopher_quality_signals

        g = gopher_quality_signals(docs, text_col=text_col)
        out = out.join(
            g.select(
                id_col, *[c for c in g.columns if c not in docs.columns]
            ),
            id_col,
            "left",
        )
    if repetition:
        from .quality import repetition_signals

        r = repetition_signals(docs, text_col=text_col, id_col=id_col)
        out = out.join(
            r.select(
                id_col, *[c for c in r.columns if c not in docs.columns]
            ),
            id_col,
            "left",
        )
    if pii:
        from .pii import pii_signals

        p = pii_signals(docs, text_col=text_col)
        out = out.join(
            p.select(
                id_col, *[c for c in p.columns if c not in docs.columns]
            ),
            id_col,
            "left",
        )
    if lm is not None:
        from .quality import bigram_logprob_scores, unigram_logprob_scores

        scorer = (
            unigram_logprob_scores if lm == "unigram" else bigram_logprob_scores
        )
        s = scorer(docs, text_col=text_col, id_col=id_col).select(
            id_col,
            F.col("mean_logprob").alias(f"{lm}_logprob"),
            "n_tokens",
        )
        out = out.join(s, id_col, "left")
    if dup_density:
        from .dedup import duplication_density

        dd = duplication_density(
            docs, n=dup_density_n, text_col=text_col, id_col=id_col
        ).select(id_col, "n_ngrams", "n_duplicated", "dup_density")
        out = out.join(dd, id_col, "left")
    if classifier_model is not None:
        from .classifier import quality_classifier_scores

        coef, b0 = classifier_model
        c = quality_classifier_scores(
            docs,
            coef,
            b0,
            num_buckets=classifier_buckets,
            text_col=text_col,
            id_col=id_col,
        ).select(id_col, F.col("score").alias("classifier_score"))
        out = out.join(c, id_col, "left")
    return out


def apply_policy(
    docs: DataFrame,
    attributes: DataFrame,
    policies: dict[str, Column | str],
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Filter the corpus by named KEEP predicates over the attribute
    frame. A document survives iff every policy predicate is true; the
    drop log records the FIRST failing policy (in dict order) as the
    reason — (doc_id, reason). Predicates are Columns or SQL strings
    over attribute columns, e.g.::

        apply_policy(docs, attrs, {
            "gopher": "passes_gopher",
            "lm": F.col("unigram_logprob") > -9.0,
            "pii": "n_pii <= 2",
        })

    Changing the policy re-runs ONLY this join — never the signal
    computation (read ``attributes`` back from parquet). One uniform-key
    join + a per-row case expression; null attribute values fail the
    predicate (null-rejecting, the conservative default).

    Partition contract (the clean_corpus rule): every input doc lands in
    kept OR dropped. Docs with NO attribute row (stale attribute store,
    partial signal run) are dropped with reason ``'no_attributes'`` —
    silently vanishing was the failure mode (review find). An empty
    ``policies`` dict keeps every attributed doc."""
    exprs = {
        name: (F.expr(p) if isinstance(p, str) else p)
        for name, p in policies.items()
    }
    reason = None
    for name, e in exprs.items():
        branch = (~F.coalesce(e, F.lit(False)), F.lit(name))
        reason = F.when(*branch) if reason is None else reason.when(*branch)
    reason_expr = reason if reason is not None else F.lit(None).cast("string")
    judged = attributes.select(id_col, reason_expr.alias("_reason"))
    # left join + explicit presence marker: a row with no attribute match
    # has _present NULL and drops as 'no_attributes'; an attributed row
    # carries its first-failing-policy reason (or NULL = keep)
    marked = docs.select(id_col).join(
        judged.withColumn("_present", F.lit(True)), id_col, "left_outer"
    )
    verdict = F.when(F.col("_present").isNull(), F.lit("no_attributes")).otherwise(
        F.col("_reason")
    )
    marked = marked.select(F.col(id_col), verdict.alias("_verdict"))
    kept = docs.join(
        marked.filter(F.col("_verdict").isNull()).select(id_col),
        id_col,
        "left_semi",
    )
    dropped = marked.filter(F.col("_verdict").isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col("_verdict").alias("reason")
    )
    return kept, dropped


def media_attributes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    metadata: bool = True,
    image: bool = True,
    audio: bool = True,
    video: bool = True,
    decoded_image: DataFrame | None = None,
    decoded_audio: DataFrame | None = None,
) -> DataFrame:
    """The attribute store's MEDIA counterpart: one wide per-blob signal
    frame keyed by ``id_col`` — byte metadata (native), image quality +
    perceptual hashes (from one image decode), audio quality (from one
    audio decode), video container metadata (headers only) — so media
    policies iterate over persisted attributes exactly like text
    policies (:func:`apply_policy` is id-generic; pass
    ``id_col='media_id'``).

    When ``kind_col`` exists, each family decodes only ITS kind's rows
    (image families ``kind='image'``, audio ``'audio'``, video ``'video'``) —
    other rows carry NULL signals, so policies over a mixed store must
    be kind-scoped (``(kind != 'image') OR sharpness > 25``: the
    null-rejecting default would otherwise drop every non-image).
    ``kind`` passes through for exactly that. Decodes are the expensive
    part: each requested family re-executes its decode subtree unless
    you pass a PERSISTED frame via ``decoded_image``/``decoded_audio``
    (same advice as doc_attributes — persist what you reuse)."""
    out = media.select(
        id_col, *([kind_col] if kind_col in media.columns else [])
    )
    if metadata:
        from .multimodal import blob_metadata

        m = blob_metadata(media, payload_col=payload_col).select(
            id_col, "n_bytes", "fingerprint"
        )
        out = out.join(m, id_col, "left")
    has_kind = kind_col in media.columns
    if image:
        from .multimodal import (
            decode_media,
            image_quality_signals,
            perceptual_hashes,
        )

        src = (
            media.filter(F.col(kind_col) == "image") if has_kind else media
        )
        dec = (
            decoded_image
            if decoded_image is not None
            else decode_media(src, payload_col=payload_col, id_col=id_col)
        )
        q = image_quality_signals(dec, id_col=id_col).select(
            id_col,
            F.col("ok").alias("image_ok"),
            "brightness",
            "contrast",
            "sharpness",
            "colorfulness",
        )
        hsh = perceptual_hashes(dec, id_col=id_col).select(
            id_col, "ahash", "dhash"
        )
        out = out.join(q, id_col, "left").join(hsh, id_col, "left")
    if audio:
        from .audio import audio_features, decode_audio

        src = (
            media.filter(F.col(kind_col) == "audio") if has_kind else media
        )
        dec = (
            decoded_audio
            if decoded_audio is not None
            else decode_audio(src, payload_col=payload_col, id_col=id_col)
        )
        a = audio_features(dec, id_col=id_col).select(
            id_col,
            F.col("ok").alias("audio_ok"),
            F.col("rms_db"),
            "peak",
            "clipping_ratio",
            "silence_ratio",
            "zcr_mean",
        )
        out = out.join(a, id_col, "left")
    if video:
        from .video import video_meta

        src = (
            media.filter(F.col(kind_col) == "video") if has_kind else media
        )
        v = video_meta(src, payload_col=payload_col, id_col=id_col).select(
            id_col,
            F.col("ok").alias("video_ok"),
            F.col("fps"),
            "declared_frames",
            "n_video_chunks",
            F.col("video_fourcc"),
        )
        out = out.join(v, id_col, "left")
    return out
