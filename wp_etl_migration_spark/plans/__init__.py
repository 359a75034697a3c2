"""Pipeline plans: YAML config, job DAG, runner (SURVEY §3)."""
