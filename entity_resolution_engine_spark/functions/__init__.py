"""Scalar / vectorized functions: normalization, similarity, hashing,
text statistics.  Policy (SURVEY.md §2.11): builtin ``pyspark.sql.functions``
wherever semantics allow; Arrow-batched pandas UDFs for the rest;
row-at-a-time Python UDFs never."""
