"""Reusable Column-expression helpers. Everything here stays JVM-side
(whole-stage codegen); no row-at-a-time Python UDFs."""
