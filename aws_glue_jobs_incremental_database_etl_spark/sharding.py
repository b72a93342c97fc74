"""md5-mod work sharding across parallel job instances.

Exact parity with the reference's inter-job scale-out
(``jdbc_incremental.py:319-325, 552-554``): a table belongs to job
``job_index`` iff ``int(md5(table_name), 16) % num_jobs == job_index``.
Deterministic, stateless, and identical across languages — the md5 hex
digest is the contract, so we must use ``hashlib.md5`` (not Python's
``hash``) for parity.

This is orchestration-level sharding (tables across job instances);
row-level sharding inside a table is the JDBC hash-partition read
(``sources.jdbc``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence


def shard_of(table_name: str, num_jobs: int) -> int:
    """The job index that owns ``table_name``."""
    if num_jobs < 1:
        raise ValueError("num_jobs must be >= 1")
    return int(hashlib.md5(table_name.encode("utf-8")).hexdigest(), 16) % num_jobs


def belongs_to_job(table_name: str, job_index: int, num_jobs: int) -> bool:
    """Mirror of ``is_table_allowed`` (``jdbc_incremental.py:319-325``)."""
    return shard_of(table_name, num_jobs) == job_index


def select_tables(
    table_names: Sequence[str], job_index: int, num_jobs: int
) -> list[str]:
    """This job instance's slice of the table list (order preserved)."""
    return [t for t in table_names if belongs_to_job(t, job_index, num_jobs)]
