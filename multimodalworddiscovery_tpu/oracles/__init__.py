"""Float64 NumPy oracles.

Per-utterance-loop reimplementations of every algorithm, written the way the
reference writes them (SURVEY.md §3: Python `for` loops over utterances, NumPy
inner math, float64).  They serve two purposes:

1. Parity oracle for the batched JAX/Pallas implementations (SURVEY.md §4
   "Oracle tests") — the reference mount is empty, so these stand in for it.
2. The CPU reference whose throughput defines the bench baseline
   (BASELINE.md: "CPU NumPy oracle first; target >= 50x oracle on TPU").
"""
