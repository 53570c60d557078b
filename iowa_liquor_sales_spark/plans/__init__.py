"""Pipeline plans: the reference's 3-stage DAG as bronze/silver/gold."""
