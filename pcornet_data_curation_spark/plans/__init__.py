"""Pipeline orchestration: full run plan, lineage, checkpoint/resume."""
