"""Reusable column-expression libraries (JVM-side, codegen-friendly)."""
