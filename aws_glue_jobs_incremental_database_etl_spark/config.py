"""Table-config model + validation.

Reproduces the reference's per-table JSON config semantics
(``jdbc_incremental.py:505-562``): a list of
``{"tableName", "bookmarkKeys", "sortOrder", "partitionSpec"}`` entries
driving the per-table incremental pipeline.  Validation parity:
``bookmarkKeys`` and ``sortOrder`` are required (raise otherwise,
``jdbc_incremental.py:541-549``); ``partitionSpec`` is optional and is
``'/'``-separated (``jdbc_incremental.py:45``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class TableConfig:
    """Validated per-table incremental-load configuration.

    ``merge_keys`` switches the table from the reference's append-only
    contract to CDC apply ([EXT]): each bookmark-delimited batch is
    MERGED into the target on these keys (latest-per-key by
    ``version_col``; rows whose ``delete_col`` is true are removed) —
    the UPDATE/DELETE half of database replication.
    """

    table_name: str
    bookmark_keys: list[str]
    sort_order: str = "ASC"
    partition_spec: list[str] = field(default_factory=list)
    merge_keys: list[str] = field(default_factory=list)
    version_col: str | None = None
    delete_col: str | None = None

    def __post_init__(self) -> None:
        if not self.table_name:
            raise ValueError("tableName is required")
        if not self.bookmark_keys:
            raise ValueError(
                f"Bookmark keys and sort order must be specified for table: {self.table_name}"
            )
        if self.sort_order.upper() not in ("ASC", "DESC"):
            raise ValueError(
                f"sortOrder must be ASC or DESC for table: {self.table_name}"
            )
        if (self.version_col or self.delete_col) and not self.merge_keys:
            raise ValueError(
                f"versionColumn/deleteColumn require mergeKeys for table: {self.table_name}"
            )
        object.__setattr__(self, "sort_order", self.sort_order.upper())


def parse_table_config(raw: str | list[dict]) -> list[TableConfig]:
    """Parse the job's ``table_config`` JSON (string or parsed list).

    Mirrors ``json.loads(args['table_config'])`` + per-entry validation
    (``jdbc_incremental.py:299-301, 541-549``).
    """
    entries = json.loads(raw) if isinstance(raw, str) else raw
    configs = []
    for e in entries:
        if "bookmarkKeys" not in e or "sortOrder" not in e:
            raise ValueError(
                "Bookmark keys and sort order must be specified for table: "
                f"{e.get('tableName')}"
            )
        spec = e.get("partitionSpec") or ""
        if isinstance(spec, str):
            spec_list = [s for s in spec.split("/") if s]
        else:
            spec_list = list(spec)
        configs.append(
            TableConfig(
                table_name=e["tableName"],
                bookmark_keys=list(e["bookmarkKeys"]),
                sort_order=e["sortOrder"],
                partition_spec=spec_list,
                merge_keys=list(e.get("mergeKeys") or []),
                version_col=e.get("versionColumn"),
                delete_col=e.get("deleteColumn"),
            )
        )
    return configs


def resolve_table_name(candidates: list[str], schema: str, table_name: str) -> str:
    """Resolve a config ``tableName`` to the fully-prefixed catalog name.

    Parity with the reference's suffix-match + exactly-one assertion
    (``jdbc_incremental.py:529-539``): the catalog name must end with
    ``{schema}_{tableName}`` (or equal ``tableName`` when no schema).
    """
    suffix = f"{schema}_{table_name}" if schema else table_name
    matches = [c for c in candidates if c.endswith(suffix)]
    if len(matches) != 1:
        raise ValueError(
            f"Unable to resolve table {table_name!r}: "
            f"{len(matches)} catalog tables match suffix {suffix!r} ({matches})"
        )
    return matches[0]
