"""Device smoke test (counterpart of the reference examples/test_cpp_lib.py)."""
import numpy as np

from plate_inverse_problem_tpu.diagnostics import test_function, device_report

print(device_report())

x = np.random.default_rng(0).standard_normal(5 * 10**7).astype(np.float32)
y = test_function(x, verbose=True)
y_np = 2.0 * x + np.sin(x)
print("max |delta| vs numpy:", np.abs(y - y_np).max())
