"""TTL-cached broadcast dictionaries — the ClickHouse dictionary analog.

The reference creates hashed in-memory dictionaries over dimension tables
with a 43 200 s refresh lifetime (``v2/sql/create_tables.sql:48-67,97-114``)
so queries can do O(1) ``dictGet`` enrichment. Spark's equivalent is a
broadcast hash join against a cached small DataFrame; this registry adds
the TTL-refresh behavior (timestamped cache, re-read when stale).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LIFETIME_S = 43_200  # reference LIFETIME(43200), v2/sql/create_tables.sql:66


@dataclass
class _Entry:
    loader: Callable[[], DataFrame]
    key: str
    lifetime_s: float
    df: DataFrame | None = None
    loaded_at: float = 0.0


@dataclass
class DictionaryRegistry:
    """Named broadcast dimensions with TTL refresh."""

    _entries: dict[str, _Entry] = field(default_factory=dict)

    def register(
        self,
        name: str,
        loader: Callable[[], DataFrame],
        key: str,
        lifetime_s: float = DEFAULT_LIFETIME_S,
    ) -> None:
        self._entries[name] = _Entry(loader=loader, key=key, lifetime_s=lifetime_s)

    def get(self, name: str) -> DataFrame:
        """The dictionary DataFrame, reloaded if older than its lifetime."""
        e = self._entries[name]
        now = time.monotonic()
        if e.df is None or (now - e.loaded_at) > e.lifetime_s:
            if e.df is not None:
                e.df.unpersist()
            e.df = e.loader().cache()
            e.df.count()  # materialize the cache eagerly, like a dict load
            e.loaded_at = now
        return e.df

    def enrich(
        self,
        df: DataFrame,
        name: str,
        fk: str | Column,
        columns: list[str] | None = None,
        how: str = "left",
        keep_key: bool = False,
    ) -> DataFrame:
        """``dictGet``-style enrichment: broadcast LEFT join on the dict key.

        Catalyst plans this as BroadcastHashJoin — no shuffle of the fact
        side, which is what makes it viable against a 100 TB fact table.
        Like ClickHouse ``dictGet``, only the dictionary's ATTRIBUTES are
        returned — the dictionary key column is dropped after the join
        (it would otherwise shadow/ambiguate a same-named fact column);
        pass ``keep_key=True`` to opt back in.
        """
        e = self._entries[name]
        dim = self.get(name)
        if columns is not None:
            dim = dim.select(e.key, *columns)
        fk_col = F.col(fk) if isinstance(fk, str) else fk
        joined = df.join(F.broadcast(dim), fk_col == dim[e.key], how)
        return joined if keep_key else joined.drop(dim[e.key])
