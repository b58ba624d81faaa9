"""Operator library: DataFrame-in, DataFrame-out composable functions."""
