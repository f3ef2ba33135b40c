"""Custom operators Spark lacks natively (SURVEY.md §4.3).

Each is a composition of built-in DataFrame ops — no custom Catalyst rules,
no RDDs — so Catalyst/AQE/codegen apply untouched and every operator scales
with ordinary shuffle semantics.
"""
