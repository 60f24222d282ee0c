"""Scalar / vectorized function library (the engine's `functions/` layer).

- textcore: pure pandas/numpy per-document statistics + model-style
  scorers (langid, perplexity). Shared verbatim by the Spark pandas-UDF
  path and the pandas oracle, so scores are bit-identical by construction.
- scrub: ordered regex PII/toxicity scrubbing (JVM regexp_replace chain
  with an equivalent Python applier used by the oracle).
- hashing: minhash / simhash / rolling-fingerprint primitives.
"""
