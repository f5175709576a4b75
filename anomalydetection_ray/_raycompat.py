"""Guarded compatibility shims for Ray Data internals.

One shim today, applied at package import (idempotent, and a no-op on
any Ray version whose internals moved — every touch is wrapped so the
engine keeps running unpatched):

Empty-schema bundle divergence
------------------------------
Ray's sort builds every EMPTY range partition through
``ArrowBlockAccessor.merge_sorted_blocks``, which drops all-empty input
blocks *before* concatenating — so the reduced block is
``_empty_table()`` with a zero-field schema even though the dropped
inputs carried the real one. Downstream ``map_batches`` stages pass
empty non-dict batches through WITHOUT calling the UDF (Ray's own
workaround for exactly this: "some all-to-all operators output empty
blocks with no schema", ``plan_udf_map_op``), so the schema-less bundle
survives to the streaming executor, whose per-operator schema tracking
(``dedupe_schemas_with_validation``) then logs

    Operator produced a RefBundle with a different schema than the
    previous one. ... new schema: .

on every sort/union whose real-schema bundle happens to arrive first
(order-dependent — the tracker already early-returns, without warning,
when the OLD schema is the empty one). The shim completes that check
symmetrically: a zero-field NEW schema carries no information either,
so it is treated as compatible with whatever non-empty schema the
operator already produced — no warning, no divergence flag, tracked
schema unchanged. Real schema mismatches (fields present on both
sides) still warn exactly as before.

A second producer of the same cosmetic divergence (round-5): Ray's
``Project`` physical op — and the ``map_batches`` planner — return
EMPTY input blocks verbatim without calling the transform
(``plan_udf_map_op.py`` "For empty input blocks, we directly output
them without calling the UDF"), so an empty block minted upstream of a
``select_columns`` keeps its PRE-projection schema (e.g. the
``vec_id`` column the projection drops) and the executor logs the
divergence against its projected siblings. Zero rows conform to any
schema, so the shim extends the same repair to any ZERO-ROW bundle
whose schema differs from the tracked one: rewrite the bundle's
schema to the tracked schema, no warning. Non-empty bundles are never
touched — a genuine mismatch on real rows still warns.

The engine's own lanes all emit schema-carrying batches (see
``functions/shuffle.ABSORB_EMPTY_BATCH_SIZE``); this shim covers the
one producer we cannot reach — the sort's reduce tasks, which run in
worker processes where no engine code is loaded.
"""

from __future__ import annotations


def patch_empty_schema_bundle_divergence() -> bool:
    """Install the shim; returns True when active (idempotent)."""
    try:
        from ray.data._internal.execution import streaming_executor_state as _ses
        from ray.data.block import _is_empty_schema
    except Exception:  # pragma: no cover - internals moved; run unpatched
        return False
    orig = getattr(_ses, "dedupe_schemas_with_validation", None)
    if orig is None:  # pragma: no cover
        return False
    if getattr(orig, "__adr_empty_schema_shim__", False):
        return True

    # *args/**kwargs: the wrapper must stay callable if a future Ray
    # adds/renames parameters at the call site (round-5 review — a fixed
    # signature would TypeError inside the streaming executor and crash
    # every pipeline); arguments pass through to ``orig`` untouched.
    def dedupe_schemas_with_validation(*args, **kwargs):
        try:
            old_schema = kwargs["old_schema"] if "old_schema" in kwargs else args[0]
            bundle = kwargs["bundle"] if "bundle" in kwargs else args[1]
            enforce = kwargs.get(
                "enforce_schemas", args[3] if len(args) > 3 else False
            )
            # under enforce_schemas=True (non-default) the original
            # UNIFIES the diverging schemas, so a zero-row bundle that
            # legitimately carries a NEW column must still widen the
            # tracked schema — delegate rather than repair (round-5
            # review)
            if not enforce and not _is_empty_schema(old_schema) and (
                _is_empty_schema(bundle.schema)
                or (old_schema != bundle.schema and bundle.num_rows() == 0)
            ):
                # a zero-field bundle (empty sort partition) neither
                # diverges from nor refines the tracked schema — repair
                # it with the tracked schema (exactly what the original
                # divergence path does, minus the warning), so the
                # caller's `self._schema = ref.schema` keeps the real
                # schema and downstream consumers never see the
                # schema-less bundle
                from ray.data._internal.execution.interfaces import RefBundle

                return (
                    RefBundle(
                        bundle.blocks,
                        schema=old_schema,
                        owns_blocks=bundle.owns_blocks,
                        output_split_idx=bundle.output_split_idx,
                        _cached_object_meta=bundle._cached_object_meta,
                        _cached_preferred_locations=bundle._cached_preferred_locations,
                    ),
                    False,
                )
        except Exception:  # pragma: no cover - be transparent on drift
            pass
        return orig(*args, **kwargs)

    dedupe_schemas_with_validation.__adr_empty_schema_shim__ = True
    _ses.dedupe_schemas_with_validation = dedupe_schemas_with_validation
    return True
