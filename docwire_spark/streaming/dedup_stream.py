"""Stateful streaming dedup: first-seen URL filtering with
``applyInPandasWithState``.

The "keep up with the crawl" companion to the batch dedup ops: as page
batches stream in, each host group keeps the set of content
fingerprints it has already emitted in checkpointed state, and only
first-seen documents pass through.  State survives query restarts via
the stream checkpoint, so a killed ingest resumes without re-emitting
(or losing) documents — the stateful analog of the batch
CheckpointedWriter's idempotent commits.

Scale notes: the shuffle key is the host (salted upstream for hot
hosts if needed — salting splits a host's state across sub-keys and
dedup stays correct per sub-key only; for exact global dedup use the
fingerprint itself as the group key, which is uniform by
construction).  State per group is the fingerprint set; with
``fp`` = md5 (32 hex chars) state grows ~32B per retained document —
bound it with a TTL timeout in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("fp", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("seen", ArrayType(StringType()))]
)


def _dedup_state_fn(key, pdf_iter, state):
    import pandas as pd

    (host,) = key
    if state.exists:
        (seen_list,) = state.get
        seen = set(seen_list or [])
    else:
        seen = set()
    out_host, out_url, out_fp = [], [], []
    for pdf in pdf_iter:
        for url, fp in zip(pdf["url"], pdf["fp"]):
            if fp not in seen:
                seen.add(fp)
                out_host.append(host)
                out_url.append(url)
                out_fp.append(fp)
    state.update((sorted(seen),))
    yield pd.DataFrame({"host": out_host, "url": out_url, "fp": out_fp})


def stream_dedup(pages: DataFrame) -> DataFrame:
    """Streaming DataFrame (url, html, ...) -> first-seen rows only.

    Fingerprint = md5 of the page bytes (exact dedup); the group key
    is the url host so per-host crawl policies can hang off the same
    state layout."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        "url",
        F.md5(F.col("html")).alias("fp"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _dedup_state_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
