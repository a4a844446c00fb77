"""Spark operators: Arrow-batched UDF stages + native DataFrame transforms."""
