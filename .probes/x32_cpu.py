import os
os.environ["PIP_TPU_PRECISION"] = "x32"
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import plate_inverse_problem_tpu as pip

acc = pip.Accelerometer('AP1030')
geom = pip.Geometry('sh_i', acc, pip.GeometryParams(100e-3, 20e-3, 2e-3, None, None))
mat = pip.get_material(7920.0, 'isotropic', E=200e9, G=75e9, beta=.003)

p32m = pip.Problem(geom, mat, acc, engine='modal')
p32d = pip.Problem(geom, mat, acc, engine='direct')
print('n_free', p32m.n_free, flush=True)

F = 64
freqs = np.linspace(40, 600, F)
fj = jnp.asarray(freqs.astype(np.float32))
th = jnp.asarray(np.asarray(p32m.parameters, np.float32))

fr_m = np.asarray(p32m.getFRFunction()(fj, th))
fr_d = np.asarray(p32d.getFRFunction()(fj, th))

# f64 oracle
os.environ["PIP_TPU_PRECISION"] = "x64"
pip.config.set_precision('x64')
p64 = pip.Problem(geom, mat, acc, engine='modal')
fr64 = np.asarray(p64.getFRFunction()(jnp.asarray(freqs), jnp.asarray(np.asarray(p64.parameters))))

print('cpu x32 modal  vs f64:', np.abs(fr_m - fr64).max() / np.abs(fr64).max(), flush=True)
print('cpu x32 direct vs f64:', np.abs(fr_d - fr64).max() / np.abs(fr64).max(), flush=True)
print('checksums: x32m %.3f x32d %.3f x64 %.3f' % (np.abs(fr_m).sum(), np.abs(fr_d).sum(), np.abs(fr64).sum()), flush=True)
