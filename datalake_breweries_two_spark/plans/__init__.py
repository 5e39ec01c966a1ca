"""Pipeline composition (the engine's replacement for the reference's
Airflow DAG): plain Python function composition over pure operators."""
