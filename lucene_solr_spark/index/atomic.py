"""Atomic updates — AtomicUpdateDocumentMerger analog (solr/core/.../
update/processor/AtomicUpdateDocumentMerger.java:76-121 merge(), plus
DistributedUpdateProcessor's fetch-then-merge-then-reindex loop).

The reference merges a partial "update document" carrying per-field op
maps ({"set": v}, {"add": v}, {"remove": v}, {"removeregex": re},
{"inc": n}) into the CURRENT stored version of the doc, then reindexes
the merged document (requires stored="true" for every field — here the
stored-fields table is the caller's docs DataFrame, the same seam
term_vectors/highlight use).

Spark-first shape: `merge_atomic` is ONE left join of the update batch
against the stored table restricted to the touched keys, with every op
compiled to built-in Column expressions (element_at / concat / filter /
regexp_like — no Python UDFs), so an update batch of any size stays
executor-bound. `atomic_update` = merge + the existing
update_documents (delete-by-key tombstone + NRT append), i.e. exactly
the reference's read-merge-reindex cycle.

Representation: every non-key column of `updates` must be
MAP<STRING, ARRAY<STRING>> — op name -> values (set/inc take a
1-element array; the reference's "plain value means set" convenience
is spelled {"set": [v]}). Values are strings cast to the stored
column's type, like Solr's schema-driven coercion.

Documented deviations:
- ops within one field apply in the fixed order set, inc, add,
  remove, removeregex (the reference iterates a HashMap — order there
  is undefined; real updates carry one op per field).
- unknown op names raise (AtomicUpdateDocumentMerger.java:106 logs a
  warning and ignores; silent drops hide pipeline bugs at scale).
- `remove` keeps duplicates of non-removed values (reference
  removeAll semantics) — implemented with filter(), not array_except
  (which would also dedupe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, NumericType

_OPS = ("set", "inc", "add", "remove", "removeregex")


def _merged_col(field: str, dtype, ops_col):
    """Column expression for the post-merge value of `field` given the
    stored value (st.<field>) and the update row's op map (may be
    null = field untouched)."""
    old = F.col(f"st.{field}")
    m = ops_col
    is_array = isinstance(dtype, ArrayType)
    elem = dtype.elementType if is_array else dtype

    new = old
    # set (AtomicUpdateDocumentMerger.doSet): replace; null removes
    set_vals = m.getItem("set")
    if is_array:
        set_to = F.transform(set_vals, lambda x: x.cast(elem))
    else:
        set_to = F.element_at(set_vals, 1).cast(elem)
    new = F.when(F.map_contains_key(m, F.lit("set")), set_to).otherwise(new)

    # inc (doInc): old + n if old exists, else n — numeric fields only
    # (Solr coerces through the schema's NumberType)
    if not is_array and isinstance(dtype, NumericType):
        inc_by = F.element_at(m.getItem("inc"), 1).cast(dtype)
        new = F.when(
            F.map_contains_key(m, F.lit("inc")),
            F.coalesce(new, F.lit(0).cast(dtype)) + inc_by,
        ).otherwise(new)

    if is_array:
        # add (doAdd): append values (creates the field if absent)
        add_vals = F.transform(m.getItem("add"), lambda x: x.cast(elem))
        new = F.when(
            F.map_contains_key(m, F.lit("add")),
            F.concat(
                F.coalesce(new, F.array().cast(dtype)), add_vals
            ),
        ).otherwise(new)
        # remove (doRemove): drop ALL occurrences of each value,
        # keep duplicates of survivors (removeAll, not set-difference)
        rm_vals = F.transform(m.getItem("remove"), lambda x: x.cast(elem))
        new = F.when(
            F.map_contains_key(m, F.lit("remove")),
            F.filter(new, lambda x: ~F.array_contains(rm_vals, x)),
        ).otherwise(new)
        # removeregex (doRemoveRegex): whole-value match per pattern
        # (p.matcher(v).matches() -> anchored)
        pats = m.getItem("removeregex")
        new = F.when(
            F.map_contains_key(m, F.lit("removeregex")),
            F.filter(
                new,
                lambda x: ~F.exists(
                    pats,
                    lambda p: F.regexp_like(
                        x.cast("string"),
                        F.concat(F.lit("^(?:"), p, F.lit(")$")),
                    ),
                ),
            ),
        ).otherwise(new)
    return new.alias(field)


def merge_atomic(
    stored: DataFrame, updates: DataFrame, key_col: str = "doc_id"
) -> DataFrame:
    """Merge an atomic-update batch into the current stored docs.

    `stored`: the full stored-fields table (one row per live doc).
    `updates`: one row per updated key; every non-key column is
    MAP<STRING, ARRAY<STRING>> ops for the same-named stored column.
    Returns the merged rows (stored schema) for exactly the update
    keys; keys absent from `stored` create new docs (reference
    behavior: toDoc starts empty), untouched fields null there.

    A batch with the SAME key twice raises: the reference applies
    same-id updates sequentially (each sees the previous merge's
    result), which a single fetch-merge join cannot reproduce —
    submitting them as separate batches preserves that semantics,
    while silently merging both rows would leave two live docs with
    one key.
    """
    if key_col not in updates.columns:
        raise ValueError(f"updates must carry the key column {key_col!r}")
    if isinstance(updates.schema[key_col].dataType, MapType):
        # AtomicUpdateDocumentMerger.java:113 — SolrException
        raise ValueError(f"Invalid update of id field: {key_col}")
    up_cols = [c for c in updates.columns if c != key_col]
    for c in up_cols:
        if c not in stored.columns:
            raise ValueError(f"unknown field in atomic update: {c!r}")
        f = updates.schema[c].dataType
        if not isinstance(f, MapType):
            raise ValueError(
                f"update column {c!r} must be MAP<STRING,ARRAY<STRING>> "
                "ops (use {'set': [v]} for plain assignment)"
            )

    # reject unknown op names at plan time (one tiny aggregate over
    # the batch — the reference warns per-doc at :106, we fail fast)
    checks = [
        F.array_distinct(
            F.flatten(F.collect_list(F.map_keys(F.col(c))))
        ).alias(c)
        for c in up_cols
    ]
    if checks:
        row = updates.agg(*checks).collect()[0]
        for c in up_cols:
            bad = [k for k in (row[c] or []) if k not in _OPS]
            if bad:
                raise ValueError(
                    f"Unknown operation for an atomic update on {c!r}: "
                    f"{bad[0]}"
                )

    dup = (
        updates.groupBy(key_col)
        .count()
        .where(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"duplicate key {dup[0][0]!r} in one atomic-update batch; "
            "same-id updates are sequential in the reference — submit "
            "them as separate batches"
        )

    joined = updates.alias("up").join(
        stored.alias("st"),
        F.col(f"up.{key_col}") == F.col(f"st.{key_col}"),
        "left",
    )
    out_cols = [F.col(f"up.{key_col}").alias(key_col)]
    for field in stored.columns:
        if field == key_col:
            continue
        dtype = stored.schema[field].dataType
        if field in up_cols:
            # null map on a row = field untouched there
            ops_col = F.coalesce(
                F.col(f"up.{field}"),
                F.map_from_arrays(F.array(), F.array()).cast(
                    updates.schema[field].dataType
                ),
            )
            out_cols.append(_merged_col(field, dtype, ops_col))
        else:
            out_cols.append(F.col(f"st.{field}").alias(field))
    return joined.select(*out_cols)


def atomic_update(
    spark: SparkSession,
    index_dir: str,
    stored: DataFrame,
    updates: DataFrame,
    batch_id: int | str,
) -> DataFrame:
    """Fetch-merge-reindex: merge the atomic batch against `stored`
    and run the merged docs through update_documents (tombstone the
    old versions + NRT-append the new). Returns the merged rows —
    the caller owns the stored-fields table and should upsert them.
    """
    import json
    import os

    from lucene_solr_spark.index.deletes import update_documents

    with open(os.path.join(index_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    key_col = manifest["config"]["id_col"]
    merged = merge_atomic(stored, updates, key_col)
    update_documents(spark, index_dir, merged, batch_id)
    return merged
