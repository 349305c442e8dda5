"""End-to-end pipeline plans: the reference's main() DAG (SURVEY §3.1)
re-expressed as one DataFrame program."""
