"""AOT predictor export round trip (`utils/serving.py`).

The serialized artifact must reproduce the live model's predictions without
touching the Python model object again (parameters baked in as constants).
"""
import numpy as np
import jax.numpy as jnp

from physs_gp_tpu.kernels import Matern32
from physs_gp_tpu.likelihoods import Gaussian
from physs_gp_tpu.models import StateSpaceGP
from physs_gp_tpu.utils import positive_param
from physs_gp_tpu.utils.serving import export_predictor, load_predictor


def _model(T=64):
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 10, T))
    y = np.sin(t)[:, None] + 0.05 * rng.normal(size=(T, 1))
    return StateSpaceGP(
        t=jnp.asarray(t), Y=jnp.asarray(y),
        kernel=Matern32(lengthscale=1.0),
        likelihood=Gaussian(positive_param(0.05 ** 2)),
    )


def test_export_predict_roundtrip(tmp_path):
    m = _model()
    ts = jnp.linspace(0.5, 9.5, 40)

    blob = export_predictor(m, ts)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

    # artifact survives a disk round trip and runs without the model object
    p = tmp_path / "predictor.hlo"
    p.write_bytes(blob)
    serve = load_predictor(p.read_bytes())
    mean, var = serve(ts)

    direct = m.predict_f(ts)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(direct.mean),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var), np.asarray(direct.var),
                               rtol=1e-10)
    assert (np.asarray(var) > 0).all()


def test_export_predict_y_and_new_inputs():
    m = _model()
    ts = jnp.linspace(0.0, 10.0, 25)
    serve = load_predictor(export_predictor(m, ts, predict="predict_y"))
    mean, var = serve(ts + 0.1)  # same SHAPE, different values
    direct = m.predict_y(ts + 0.1)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(direct.mean),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var), np.asarray(direct.var),
                               rtol=1e-10)
