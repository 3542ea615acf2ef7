"""Device smoke test (counterpart of the reference examples/test_cpp_lib.py)."""
# allow running from a source checkout: python examples/<name>.py
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from plate_inverse_problem_tpu.diagnostics import test_function, device_report

print(device_report())

x = np.random.default_rng(0).standard_normal(5 * 10**7).astype(np.float32)
y = test_function(x, verbose=True)
y_np = 2.0 * x + np.sin(x)
print("max |delta| vs numpy:", np.abs(y - y_np).max())
