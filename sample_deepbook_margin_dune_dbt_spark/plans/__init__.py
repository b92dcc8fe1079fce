from .inspect import explain_str, audit_plan

__all__ = ["explain_str", "audit_plan"]
