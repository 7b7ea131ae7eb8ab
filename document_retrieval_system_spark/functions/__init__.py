"""Scalar/text functions shared by the oracle and the vectorized Spark UDFs."""
