"""Doc-count sync gate (VERDICT r8 Next-round #8).

README's quick-start paragraph quotes the oracle-paired query count;
it drifted twice (366→388→397) because nothing asserted it.  This
test parses the quoted number and fails the suite the moment the
registry and the README disagree, so the sync happens in the same
commit that adds a query.
"""

from __future__ import annotations

import re
from pathlib import Path

from aws_glue_jobs_incremental_database_etl_spark import registry

README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_query_count_matches_registry():
    m = re.search(r"\((\d+) oracle-paired queries", README.read_text())
    assert m, "README quick-start no longer quotes the query count"
    assert int(m.group(1)) == len(registry.Q), (
        f"README says {m.group(1)} oracle-paired queries; registry has "
        f"{len(registry.Q)} — update the README quick-start paragraph"
    )


def test_every_query_has_an_oracle():
    missing = [n for n in registry.Q if n not in registry.O]
    assert not missing, f"queries without oracle_sql entries: {missing}"


def test_plans_md_registry_hash_is_current():
    """VERDICT r9 Next-round #5: PLANS.md is the driver-visible plan
    audit artifact — this pin fails the suite whenever the registry's
    query set changes without regenerating it (python
    tools/plan_report.py), and whenever the committed artifact
    records an audit violation."""
    from aws_glue_jobs_incremental_database_etl_spark.plans.audit import (
        registry_names_hash,
    )

    plans = Path(__file__).resolve().parent.parent / "PLANS.md"
    text = plans.read_text()
    m = re.search(r"Registry hash: `([0-9a-f]{16})`", text)
    assert m, (
        "PLANS.md carries no registry-hash stamp — regenerate it with "
        "python tools/plan_report.py"
    )
    assert m.group(1) == registry_names_hash(), (
        "PLANS.md is stale (registry hash mismatch) — regenerate it "
        "with python tools/plan_report.py"
    )
    assert "Audit: CLEAN" in text, (
        "the committed PLANS.md records plan-audit violations"
    )
