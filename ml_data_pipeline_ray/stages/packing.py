"""Sequence packing: assign documents to fixed token-budget chunks.

The core batching step of an LLM training-data pipeline: documents are
packed, in a deterministic order, into chunks whose token budget is ``B``
(chunk = the unit that later becomes one training sequence / shard file).

Semantics (deterministic, SQL-expressible — mirrored by the DuckDB oracle):
within each packing domain (``domain_col``, e.g. ``source``), documents are
ordered by ``order_col`` and chunk ``i`` covers the rows whose *preceding*
cumulative token count lies in ``[i*B, (i+1)*B)``::

    chunk_id = floor((cumsum(tokens) - tokens) / B)

i.e. boundary documents overflow their chunk rather than split — the
standard greedy document-packing rule with a running counter.

Ray-native shape: one ``map_batches`` appends the vectorized token count,
ONE ``groupby(domain)`` shuffle co-locates each domain, and the in-group
kernel is a single numpy sort + cumsum. Partitioning assumption: one
domain's (id, tokens) pairs fit one group — these are two int64 columns
(the text itself is NOT shuffled), so a 10^9-document domain is ~16 GB;
for domains beyond that, the hierarchical scale path is per-shard token
sums + a driver-side prefix over shard offsets (noted here, not needed at
any tested scale).

Reference parity: the reference has no packing operator; this is part of
the beyond-reference LLM-pipeline surface (brief: "operations a
large-scale training-data pipeline would need").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

#: tokens = runs of non-whitespace — matches DuckDB
#: ``length(regexp_extract_all(text, '\S+'))`` exactly.
WS_TOKEN_RE = r"\S+"


def add_ws_token_count(batch: pa.Table, text_col: str = "text",
                       out_col: str = "tokens") -> pa.Table:
    """Append whitespace-token count (vectorized RE2 kernel)."""
    n = pc.count_substring_regex(batch.column(text_col), WS_TOKEN_RE)
    return batch.append_column(out_col, n.cast(pa.int64()))


def pack_by_token_budget(ds: rd.Dataset, budget: int,
                         domain_col: str = "source",
                         order_col: str = "doc_id",
                         text_col: str = "text") -> rd.Dataset:
    """Pack documents into token-budget chunks; return the per-chunk summary
    ``(domain_col, chunk_id, n_docs, sum_tokens)``.

    Only (domain, order, tokens) travel through the shuffle — the text is
    dropped right after counting, so shuffle bytes are O(rows), not O(corpus).
    """
    def count(batch: pa.Table) -> pa.Table:
        batch = add_ws_token_count(batch, text_col=text_col)
        return batch.select([domain_col, order_col, "tokens"])

    narrow = ds.map_batches(count, batch_format="pyarrow",
                            zero_copy_batch=True)

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g[order_col].to_numpy(), kind="stable")
        toks = g["tokens"].to_numpy()[order]
        chunk = (np.cumsum(toks) - toks) // budget
        out = pd.DataFrame({domain_col: g[domain_col].iloc[0],
                            "chunk_id": chunk, "tokens": toks})
        return (out.groupby("chunk_id", as_index=False)
                .agg(n_docs=("tokens", "size"), sum_tokens=("tokens", "sum"))
                .assign(**{domain_col: g[domain_col].iloc[0]})
                [[domain_col, "chunk_id", "n_docs", "sum_tokens"]])

    return narrow.groupby(domain_col).map_groups(pack_group,
                                                 batch_format="pandas")
