"""Schema evolution: the order-stable merge of source into target.

Reimplements — decision for decision — the reference's
``update_table`` merge (``jdbc_incremental.py:424-478``), the one
genuinely non-trivial semantic in its data model (SURVEY.md §1.3, E2).
Constraints, from the reference's own comments (``:436-439``):

1. the existing target column order never changes;
2. columns dropped at the source are *retained* in the target (old
   data stays queryable);
3. a source type change updates the type **in place** (position kept);
4. brand-new source columns are appended at the end — excluding
   partition columns (``:452-459``).

Columns are catalog-shaped dicts ``{'Name': str, 'Type': str}``.
"""

from __future__ import annotations

from collections.abc import Sequence

Column = dict[str, str]


def merge_schemas(
    source_columns: Sequence[Column],
    target_columns: Sequence[Column],
    partition_spec: Sequence[str] = (),
) -> list[Column]:
    """Merge an evolved source schema into the existing target schema.

    Mirrors ``jdbc_incremental.py:441-460``:
    ``modified_fields`` walks the *target* order, substituting the
    source's (possibly retyped) column when the name still exists;
    ``new_fields`` appends source columns absent from the target and
    not in the partition spec.
    """
    source_map = {c["Name"]: c for c in source_columns}
    target_names = {c["Name"] for c in target_columns}

    modified_fields = [
        source_map[c["Name"]] if c["Name"] in source_map else c
        for c in target_columns
    ]
    new_fields = [
        c
        for c in source_columns
        if c["Name"] not in target_names and c["Name"] not in partition_spec
    ]
    return [dict(c) for c in modified_fields + new_fields]
