"""Generated-inventory freshness tripwires (r5 verdict task #2).

PLANS.md is the anti-pattern tripwire (surprise shuffles / SMJ /
cartesians) and OPMAP.md the coverage inventory — both are generated
from the live ``queries()`` registry and MUST be regenerated in the
same commit that adds or renames a query:

    python tools/gen_opmap.py
    python tools/audit_plans.py > PLANS.md

Round 5 shipped 13 queries with no plan-audit row because nothing
enforced this; these tests make a stale inventory a red test instead
of a judge finding.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _table_queries(path: str) -> set[str]:
    names = set()
    with open(os.path.join(ROOT, path)) as f:
        for line in f:
            m = re.match(r"\|\s*(q_\w+)\s*\|", line)
            if m:
                names.add(m.group(1))
    return names


def _registry() -> set[str]:
    import __spark_entry__ as entrymod

    return set(entrymod.queries())


def test_opmap_covers_registry():
    reg = _registry()
    opmap = _table_queries("OPMAP.md")
    assert opmap == reg, (
        f"OPMAP.md is stale — regenerate with `python tools/gen_opmap.py` "
        f"(missing: {sorted(reg - opmap)[:10]}, "
        f"orphaned: {sorted(opmap - reg)[:10]})"
    )


def test_plans_covers_registry():
    reg = _registry()
    plans = _table_queries("PLANS.md")
    assert plans == reg, (
        f"PLANS.md is stale — regenerate with "
        f"`python tools/audit_plans.py > PLANS.md` "
        f"(missing: {sorted(reg - plans)[:10]}, "
        f"orphaned: {sorted(plans - reg)[:10]})"
    )


def test_plans_no_audit_errors():
    with open(os.path.join(ROOT, "PLANS.md")) as f:
        bad = [ln for ln in f if "audit error" in ln]
    assert bad == [], f"PLANS.md rows failed to audit: {bad[:5]}"
