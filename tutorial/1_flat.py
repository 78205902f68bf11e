"""Tutorial 1: exact brute-force search (reference tutorial/cpp/1-Flat)."""
import _bootstrap  # noqa: F401  (repo-root fallback for script runs)
import numpy as np
import auncel_tpu as at

d, nb, nq = 64, 100_000, 10
rng = np.random.RandomState(0)
xb = rng.randn(nb, d).astype(np.float32)
xq = rng.randn(nq, d).astype(np.float32)

index = at.FlatIndex(d)
index.add(xb)
D, I = index.search(xq, k=4)
print("neighbors:\n", I)
print("squared distances:\n", D)
