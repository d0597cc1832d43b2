"""Query-planning layer: decimation-level selection and retention-fallback
union plans (SURVEY.md §4 'custom planner code')."""
