"""Physical-plan auditing (pushdown / pruning / broadcast / Python-crossing
assertions) — see :mod:`.audit`."""

from .audit import audit_report, formatted_plan

__all__ = ["audit_report", "formatted_plan"]
