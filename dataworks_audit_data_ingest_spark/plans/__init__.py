"""Plan inspection utilities (used by the plan-shape regression tests)."""

from .inspect import formatted_plan, physical_plan, read_schema_columns  # noqa: F401
