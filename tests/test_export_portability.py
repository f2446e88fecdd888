"""StableHLO serving-artifact portability (L11 honesty check).

The exported `.stablehlo` + `.params` pair must be loadable in a FRESH
python process that never imports `passl_tpu` — only jax + flax
serialization — and run on plain CPU. This is the TPU-world analogue of
the reference's "paddle-inference/ONNXRuntime loads the saved model"
guarantee (`deploy/utils/predictor.py:35-70`): the artifact stands
alone, the framework is not needed at serving time.
"""
import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

CONSUMER = textwrap.dedent("""
    # Fresh-process consumer: NO passl_tpu import allowed.
    import sys
    assert all("passl_tpu" not in m for m in sys.modules), "clean process"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from flax import serialization
    from jax import export as jexport

    art_dir = sys.argv[1]
    with open(f"{art_dir}/inference.stablehlo", "rb") as f:
        exp = jexport.deserialize(f.read())
    params = serialization.msgpack_restore(open(f"{art_dir}/inference.params", "rb").read())
    x = np.random.RandomState(0).rand(3, 32, 32, 3).astype("float32")
    out = exp.call(params, x)
    out = np.asarray(out)
    assert out.shape == (3, 10), out.shape
    assert np.isfinite(out).all()
    assert "passl_tpu" not in "".join(sys.modules), "still clean"
    print("PORTABLE_OK", out.shape)
""")


def test_stablehlo_artifact_runs_without_framework(tmp_path):
    import jax
    import jax.numpy as jnp

    from passl_tpu.models import build_model
    from passl_tpu.utils import io

    model = build_model({"name": "VisionTransformer", "img_size": 32,
                         "patch_size": 8, "embed_dim": 64, "depth": 2,
                         "num_heads": 4, "num_classes": 10})
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.PRNGKey(0)}, x)
    io.export(model, variables, x, str(tmp_path))

    consumer = tmp_path / "consumer.py"
    consumer.write_text(CONSUMER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([sys.executable, str(consumer), str(tmp_path)],
                         capture_output=True, text=True, timeout=300, env=env,
                         cwd=str(tmp_path))  # cwd outside the repo: no accidental import
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PORTABLE_OK" in res.stdout


def test_stablehlo_artifact_vmoe(tmp_path):
    """Routed-expert inference (argmax top-k dispatch, capacity one-hots)
    also exports to a standalone StableHLO artifact — sparse models are
    servable with no framework at runtime."""
    import jax
    import jax.numpy as jnp

    from passl_tpu.models import build_model
    from passl_tpu.utils import io

    model = build_model({"name": "VisionTransformerMoE", "img_size": 32,
                         "patch_size": 8, "embed_dim": 64, "depth": 2,
                         "num_heads": 2, "num_classes": 10,
                         "num_experts": 4, "moe_k": 2, "moe_interval": 2})
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.PRNGKey(0)}, x)
    io.export(model, variables, x, str(tmp_path))

    consumer = tmp_path / "consumer.py"
    consumer.write_text(CONSUMER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([sys.executable, str(consumer), str(tmp_path)],
                         capture_output=True, text=True, timeout=300, env=env,
                         cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PORTABLE_OK" in res.stdout


TF_CONSUMER = textwrap.dedent("""
    # Second-runtime consumer: ONLY tensorflow — no passl_tpu, no jax.
    import sys
    import numpy as np
    import tensorflow as tf

    art_dir = sys.argv[1]
    m = tf.saved_model.load(f"{art_dir}/inference.tf")
    x = np.random.RandomState(0).rand(3, 32, 32, 3).astype("float32")
    out = np.asarray(m.serve(x))
    ref = np.load(f"{art_dir}/expected.npy")
    assert out.shape == ref.shape == (3, 10), (out.shape, ref.shape)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
    # the framework must not be needed at serving time (TF's bundled
    # keras may lazily import jax for backend detection; that's TF's
    # business — execution goes through tf XlaCallModule either way)
    assert all("passl_tpu" not in mod for mod in sys.modules), \
        "serving process imported passl_tpu"
    print("TF_SERVE_OK", out.shape)
""")


def test_tf_savedmodel_second_runtime(tmp_path):
    """The "tf" export format is a genuinely second serving runtime:
    a fresh process importing ONLY tensorflow loads the SavedModel and
    reproduces the in-framework logits (reference counterpart: the
    predictor's ONNXRuntime branch, deploy/utils/predictor.py:35-70)."""
    pytest.importorskip("tensorflow")
    import jax
    import numpy as np
    import jax.numpy as jnp

    from passl_tpu.models import build_model
    from passl_tpu.utils import io

    model = build_model({"name": "VisionTransformer", "img_size": 32,
                         "patch_size": 8, "embed_dim": 64, "depth": 2,
                         "num_heads": 4, "num_classes": 10})
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.PRNGKey(0)}, x)
    io.export(model, variables, x, str(tmp_path), formats=("tf",))

    xq = np.random.RandomState(0).rand(3, 32, 32, 3).astype("float32")
    expected = np.asarray(model.apply(variables, jnp.asarray(xq), train=False))
    np.save(tmp_path / "expected.npy", expected)

    consumer = tmp_path / "tf_consumer.py"
    consumer.write_text(TF_CONSUMER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run([sys.executable, str(consumer), str(tmp_path)],
                         capture_output=True, text=True, timeout=600, env=env,
                         cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-2000:]
    assert "TF_SERVE_OK" in res.stdout
