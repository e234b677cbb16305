"""Workarounds for known upstream Ray Data issues (version-gated).

``patch_hash_shuffle_schema_broadcast`` fixes a schema-dissemination race in
Ray 2.49's hash-shuffle operator (``ray/data/_internal/execution/operators/
hash_shuffle.py``): ``_shuffle_block`` returns early for EMPTY input blocks
(``if block.num_rows == 0: return``) *before* the ``send_empty_blocks``
branch that broadcasts the sequence schema to every aggregator — yet the
operator marks schemas-as-broadcast when it submits the first shuffle task,
whichever block that is. If the first block of a join input sequence happens
to be empty (common when the input is itself the output of a native join or
a groupby, which emit one block per partition and most partitions of a small
or skewed dataset are empty), aggregator partitions that receive no
non-empty shard finalize with a COLUMN-LESS left/right table and
``pyarrow.Table.join`` raises ``ArrowInvalid: No match or multiple matches
for key field reference`` — the round-1 ``telemetry_join_fixture`` crash,
reproducible at num_cpus=32 / 16 partitions.

The patch wraps the remote function: for an empty block with
``send_empty_blocks=True`` it fans a schema-only empty shard out to every
aggregator (exactly what the function already does for empty *partitions* of
a non-empty block); all other calls delegate to the original. Applied only
when the buggy early-return is present in the installed Ray source.
"""

from __future__ import annotations

_installed = False


def patch_hash_shuffle_schema_broadcast() -> bool:
    global _installed
    if _installed:
        return True
    try:
        import inspect

        import ray
        from ray.data._internal.execution.operators import hash_shuffle as hs

        orig_remote_fn = hs._shuffle_block
        orig_fn = orig_remote_fn._function
        src = inspect.getsource(orig_fn)
        if "if block.num_rows == 0:" not in src or "send_empty_blocks" not in src:
            return False  # upstream changed/fixed — leave untouched

        from ray.data._internal.arrow_block import ArrowBlockAccessor  # noqa: F401
        from ray.data._internal.execution.operators.hash_shuffle import (
            _create_empty_table,
        )
        from ray.data._internal.table_block import TableBlockAccessor
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType

        def _shuffle_block_schema_safe(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=None,
            send_empty_blocks=False,
            override_partition_id=None,
        ):
            stats = BlockExecStats.builder()
            if block_transformer is not None:
                block = block_transformer(block)
            block = TableBlockAccessor.try_convert_block_type(
                block, block_type=BlockType.ARROW
            )
            # Upstream broadcasts schemas only from the FIRST submitted task
            # of each input; if that block is empty the broadcast is silently
            # dropped, and some producers (sort-based groupby/map_groups)
            # even emit ZERO-COLUMN empty blocks that carry no schema at all.
            # Make every task broadcast-capable instead: fan schema-only
            # shards to partitions that would otherwise receive nothing.
            # For dense blocks every partition is non-empty, so this adds no
            # traffic in the hot path.
            has_schema = len(block.schema) > 0
            if block.num_rows == 0:
                if has_schema:
                    shard = _create_empty_table(block.schema)
                    pending = []
                    for pid in range(pool.num_partitions):
                        aggregator = pool.get_aggregator_for_partition(pid)
                        ref = ray.put(shard)
                        pending.append(
                            aggregator.submit.remote(input_index, pid, ref)
                        )
                    while pending:
                        _, pending = ray.wait(
                            pending, num_returns=len(pending), timeout=1
                        )
                meta = BlockAccessor.for_block(block).get_metadata(
                    exec_stats=stats.build()
                )
                return (meta, {})
            return orig_fn(
                block,
                input_index,
                key_columns,
                pool,
                block_transformer=None,  # already applied above
                send_empty_blocks=True,  # always disseminate schemas
                override_partition_id=override_partition_id,
            )

        hs._shuffle_block = ray.remote(_shuffle_block_schema_safe)
        _installed = True
        return True
    except Exception:
        return False
