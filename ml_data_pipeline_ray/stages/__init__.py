"""Operator library: vectorized per-batch transforms for ``Dataset.map_batches``.

Each module provides plain functions / callable classes with Arrow-in,
Arrow-out semantics (``batch_format="pyarrow"``), mirroring the reference's
``RecordBatchTransform`` surface (``ml-data/ml-data-core/src/transform.rs:30-54``)
without porting its execution machinery.
"""
