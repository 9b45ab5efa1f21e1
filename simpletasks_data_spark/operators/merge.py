"""The merge: one source folded into the running target image.

This is the Spark re-expression of the reference's row-at-a-time
``_parseSource`` loop (``/root/reference/simpletasks_data/importtask.py:
197-311``): scan -> header skip -> row filter -> project(parse) -> key
normalize -> per-key last-wins aggregation -> FULL OUTER equi-join with the
target image -> per-column policy branches (SQL ``MERGE`` semantics: WHEN
MATCHED / WHEN NOT MATCHED [BY SOURCE]) -> counters.

Scale design (100 TB north star):

- The target image is never materialized on the driver (the reference holds
  it all in a dict, ``importtask.py:211-216``); everything is DataFrame ops,
  Catalyst picks broadcast-hash vs sort-merge per side and AQE re-plans at
  runtime (skew join, partition coalescing).
- Within-source duplicate keys are resolved with ONE hash aggregation
  (``max_by`` over the order column) rather than a window sort — partial
  aggregation runs map-side, and the single shuffle on the (normalized) key
  is shared with the subsequent join.
- Counters are computed in one pass over the pre-dedupe projection with
  ``count_if`` aggregates — no driver-side loops, no extra scans.

Working-image bookkeeping columns (carried, columnar, shuffle-free):
``_orig_<col>`` (task-start value — pre-image for history/cancel/revert),
``_creating`` (row created during this task). Everything else is the target
schema itself holding pending (post-merge) values, which is what gives later
sources cross-source visibility of earlier pending updates
(``importtask.py:136-150``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..mapping import BoundMapping
from ..sources.base import SRC_POS, ImportMode, Source

ORIG = "_orig_"
CREATING = "_creating"


@dataclass
class MergeStepResult:
    image: DataFrame          # new working image (target cols + _orig_* + _creating)
    counters: Dict[str, int]  # reference per-source counter dict


def init_image(target_df: DataFrame, target_cols: List[str]) -> DataFrame:
    """Target snapshot -> working image: every column doubled as its own
    pre-image, _creating=false."""
    sel = [F.col(c) for c in target_cols]
    sel += [F.col(c).alias(ORIG + c) for c in target_cols]
    sel.append(F.lit(False).alias(CREATING))
    return target_df.select(*sel)


def finalize_image(image: DataFrame, target_cols: List[str]) -> DataFrame:
    return image.select(*[F.col(c) for c in target_cols])


def merge_source(
    spark: SparkSession,
    image: DataFrame,
    source: Source,
    bound: BoundMapping,
    target_cols: List[str],
) -> MergeStepResult:
    """Fold one source into the working image; returns the new image (lazy)
    plus the reference-shaped per-source counters (computed, one job)."""
    mode = source.mode
    can_create = bool(mode & ImportMode.CREATE)
    can_update = bool(mode & ImportMode.UPDATE)
    key_name = bound.key_column_name
    mapped = bound.columns
    mapped_names = [c.name for c in mapped]

    # ---- scan -> header skip -> row filter (importtask.py:220-225) --------
    raw = source.load_raw(spark)
    header_n = source.get_header_line_number()
    if header_n >= 0:
        raw = raw.filter(F.col(SRC_POS) > header_n)
    pred = source.should_import(raw)
    if pred is not None:
        raw = raw.withColumn("_imp", pred)
    else:
        raw = raw.withColumn("_imp", F.lit(True))

    # ---- project: parse every mapped column + err channel -----------------
    proj_cols = [F.col(SRC_POS), F.col("_imp")]
    for bc in mapped:
        v, e = bc.exprs(raw)
        proj_cols.append(v.alias("v_" + bc.name))
        proj_cols.append(e.alias("e_" + bc.name))
    pre = raw.select(*proj_cols)
    # Key: parsed key normalized; parse-miss (NULL) -> ignored_missing_id
    # (importtask.py:229-232).
    pre = pre.withColumn("_key", bound.normalize_key(F.col("v_" + key_name)))

    # ---- per-row match status against the image (for exact counters) ------
    image_keys = (
        image.select(bound.normalize_key(F.col(key_name)).alias("_key"))
        .where(F.col("_key").isNotNull())
        .distinct()
    )
    pre = pre.join(image_keys.withColumn("_m", F.lit(True)), on="_key", how="left")
    matched_static = F.coalesce(F.col("_m"), F.lit(False))

    # Within-source dynamics: once a CREATE-capable source has seen a key, a
    # later duplicate row probes the *pending* item and is "matched"
    # (importtask.py:294-297).
    if can_create:
        w_first = F.min(F.when(F.col("_imp") & F.col("_key").isNotNull(), F.col(SRC_POS))).over(
            Window.partitionBy("_key")
        )
        matched_dyn = matched_static | (F.col(SRC_POS) > w_first)
    else:
        matched_dyn = matched_static

    imported = F.col("_imp")
    key_ok = imported & F.col("_key").isNotNull()
    gate = key_ok & F.when(matched_dyn, F.lit(can_update)).otherwise(F.lit(can_create))
    pre = pre.withColumn("_gate", gate).withColumn("_matched", matched_dyn)

    # The parsed projection feeds the counter aggregate AND the merge —
    # materialize it once instead of re-running scan+parse per consumer.
    # (Local mode: block-manager checkpoint; on a cluster this would be a
    # reliable checkpoint or an exchange reuse.)
    pre = pre.localCheckpoint(eager=False)

    # ---- counters over the pre-dedupe projection (one aggregate) ----------
    cnt = pre.agg(
        F.count_if(~imported).alias("ignored"),
        F.count_if(imported & F.col("_key").isNull()).alias("ignored_missing_id"),
        F.count_if(key_ok & ~F.col("_matched") & F.lit(not can_create)).alias("ignored_not_created"),
        F.count_if(key_ok & F.col("_matched") & F.lit(not can_update)).alias("ignored_not_updated"),
        F.count_if(F.col("_gate")).alias("read"),
    ).collect()[0]

    # ---- last-wins per key: ONE hash agg, no window sort ------------------
    val_struct = F.struct(*[F.col("v_" + n) for n in mapped_names], *[F.col("e_" + n) for n in mapped_names])
    s = (
        pre.where(F.col("_key").isNotNull() & F.col("_imp"))
        .groupBy("_key")
        .agg(
            F.max_by(val_struct, F.when(F.col("_gate"), F.col(SRC_POS))).alias("_vals"),
            F.max(F.col("_gate")).alias("_has_vals"),
        )
    )
    s = s.select(
        F.col("_key"),
        F.col("_has_vals"),
        F.lit(True).alias("_s_present"),
        *[F.col("_vals").getField("v_" + n).alias("v_" + n) for n in mapped_names],
        *[F.col("_vals").getField("e_" + n).alias("e_" + n) for n in mapped_names],
    )

    # ---- FULL OUTER merge join (importtask.py:234-249) --------------------
    t = image.withColumn("_t_key", bound.normalize_key(F.col(key_name))).withColumn(
        "_t_present", F.lit(True)
    )
    j = t.join(s, t["_t_key"] == s["_key"], "full_outer")

    t_here = F.coalesce(F.col("_t_present"), F.lit(False))
    s_here = F.coalesce(F.col("_s_present"), F.lit(False))
    s_vals = F.coalesce(F.col("_has_vals"), F.lit(False))
    is_update = t_here & s_here & s_vals & F.lit(can_update)
    is_insert = ~t_here & s_here & s_vals & F.lit(can_create)

    by_name = {bc.name: bc for bc in mapped}
    out_cols: List = []
    for c in target_cols:
        t_c = F.col(c)
        orig_c = F.col(ORIG + c)
        bc = by_name.get(c)
        if bc is None:
            new_c = F.when(is_insert, F.lit(None).cast(dict_dtype(image, c))).otherwise(t_c)
        else:
            spec = bc.spec
            v_c, e_c = F.col("v_" + c), F.coalesce(F.col("e_" + c), F.lit(False))
            upd_ok = F.lit(spec.should_update) & ~e_c
            if spec.should_update_only_if_null:
                upd_ok = upd_ok & t_c.isNull()
            # Per-column diff vs pending (no-op keep) and vs the stored
            # pre-image (duplicate cancel, importtask.py:266-270).
            eq_pending = spec.compare_expr(v_c, t_c)
            eq_orig = spec.compare_expr(v_c, orig_c)
            upd_val = F.when(eq_pending, t_c).when(eq_orig, orig_c).otherwise(v_c)
            new_c = (
                F.when(is_insert, F.when(e_c, F.lit(None).cast(dict_dtype(image, c))).otherwise(v_c))
                .when(is_update & upd_ok, upd_val)
                .otherwise(t_c)
            )
        out_cols.append(new_c.alias("n_" + c))

    j = j.select(
        *[F.col(ORIG + c) for c in target_cols],
        F.col(CREATING),
        F.col("_t_key"),
        t_here.alias("_th"),
        s_here.alias("_sh"),
        s_vals.alias("_sv"),
        *out_cols,
    )

    # Rows that exist on neither branch's output: source-only keys that may
    # not create (UPDATE-only unknown keys, importtask.py:234-237).
    j = j.where(F.col("_th") | (F.col("_sh") & F.col("_sv") & F.lit(can_create)))

    new_creating = F.when(~F.col("_th"), F.lit(True)).otherwise(F.col(CREATING))

    out = j.select(
        *[F.col("n_" + c).alias(c) for c in target_cols],
        *[F.col(ORIG + c) for c in target_cols],
        new_creating.alias(CREATING),
        F.col("_th").alias("_was_target"),
        F.col("_sh").alias("_seen"),
    )

    # Materialize the merged image ONCE: the not_found/rejected counts, the
    # next source's fold, and the final apply all read this frame — without
    # the checkpoint each would re-execute the join. This is also the
    # cross-source lineage cut (importtask semantics need source N+1 to see
    # source N's pending state anyway).
    out = out.localCheckpoint(eager=True)

    # ---- per-source validate_updates hook (importsource.py:109-123) -------
    rejected = 0
    hook = source.validate_updates(
        F.struct(*[F.col(c) for c in target_cols]),
        F.struct(*[F.col(ORIG + c).alias(c) for c in target_cols]),
        F.col(CREATING),
    )
    comps = {bc.name: bc for bc in mapped}
    changed_any = F.lit(False)
    for c in target_cols:
        bc = comps.get(c)
        cmp_eq = (
            bc.spec.compare_expr(F.col(c), F.col(ORIG + c))
            if bc is not None
            else F.col(c).eqNullSafe(F.col(ORIG + c))
        )
        changed_any = changed_any | ~cmp_eq
    pending_item = changed_any | F.col(CREATING)

    if hook is not None:
        invalid = F.col("_seen") & pending_item & ~F.coalesce(hook, F.lit(True))
        rejected = out.where(invalid).count()
        if rejected:
            # del updates[item]: creating items vanish, updated items revert
            # to their stored pre-image (importtask.py:287-292).
            out = out.where(~(invalid & F.col(CREATING)))
            reverted = [
                F.when(invalid, F.col(ORIG + c)).otherwise(F.col(c)).alias(c) for c in target_cols
            ]
            out = out.select(
                *reverted,
                *[F.col(ORIG + c) for c in target_cols],
                F.col(CREATING),
                F.col("_was_target"),
                F.col("_seen"),
            )

    # ---- not_found: target rows whose key never appeared (anti-join
    # semantics of WHEN NOT MATCHED BY SOURCE; importtask.py:299-301) -------
    nf_pred = F.col("_was_target") & ~F.col("_seen")
    not_found = out.where(nf_pred).count()
    nf_handled = source.on_data_not_found(finalize_image(out.where(nf_pred), target_cols))

    new_image = out.select(*target_cols, *[ORIG + c for c in target_cols], CREATING)
    if nf_handled is not None:
        # The hook rewrote the not-found slice (flagged, mutated, or emptied
        # to delete — importsource.py:125-133 "can delete the item"): splice
        # it back in. Rows the hook dropped leave the image; rows it changed
        # keep their pre-image so the edit shows up as a pending update.
        kept = out.where(~nf_pred).select(
            *target_cols, *[ORIG + c for c in target_cols], CREATING
        )
        nf_orig = out.where(nf_pred).select(
            bound.normalize_key(F.col(key_name)).alias("_nfk"),
            *[F.col(ORIG + c) for c in target_cols],
            F.col(CREATING),
        )
        handled = nf_handled.join(
            nf_orig, bound.normalize_key(nf_handled[key_name]) == nf_orig["_nfk"], "left"
        ).select(
            *[nf_handled[c] for c in target_cols],
            *[F.col(ORIG + c) for c in target_cols],
            F.coalesce(F.col(CREATING), F.lit(False)).alias(CREATING),
        )
        new_image = kept.unionByName(handled)

    counters = {
        "read": int(cnt["read"]),
        "ignored": int(cnt["ignored"]),
        "ignored_missing_id": int(cnt["ignored_missing_id"]),
        "ignored_not_created": int(cnt["ignored_not_created"]),
        "ignored_not_updated": int(cnt["ignored_not_updated"]),
        "rejected": int(rejected),
        "not_found": int(not_found),
    }
    return MergeStepResult(image=new_image, counters=counters)


def dict_dtype(df: DataFrame, col: str):
    return dict(df.dtypes)[col]
