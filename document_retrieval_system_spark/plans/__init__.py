"""Plan-quality helpers: assert pushdown/pruning properties of queries."""
