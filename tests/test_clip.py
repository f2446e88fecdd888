"""CLIP dual-tower + tokenizer tests."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from passl_tpu.core import TrainState
from passl_tpu.data.tokenizer import SimpleTokenizer
from passl_tpu.engine.steps import make_train_step
from passl_tpu.models import build_model
from passl_tpu.optimizer import build_optimizer
from passl_tpu.scheduler import build_lr_scheduler
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (smoke tier skips)


def test_tokenizer_clip_parity_golden():
    """Default (vendored 16e6 vocab) must reproduce known OpenAI-CLIP
    token ids — same asset the reference ships
    (passl_v110/utils/bpe_simple_vocab_16e6.txt.gz, tokenizer.py:30-65)."""
    tok = SimpleTokenizer()
    assert tok.vocab_size == 49408
    assert (tok.sot, tok.eot) == (49406, 49407)
    golden = {
        "a photo of a cat": [49406, 320, 1125, 539, 320, 2368, 49407],
        "hello world": [49406, 3306, 1002, 49407],
        "a diagram": [49406, 320, 22697, 49407],
        "A photo of a DOG.": [49406, 320, 1125, 539, 320, 1929, 269, 49407],
    }
    for text, ids in golden.items():
        got = tok.tokenize(text)[0][: len(ids)].tolist()
        assert got == ids, (text, got)
    # decode inverts encode (modulo lowercasing) for plain text
    assert tok.decode(tok.encode("a photo of a cat")) == "a photo of a cat"


def test_tokenizer_roundtrip_and_shape():
    tok = SimpleTokenizer(bpe_path="")  # byte-level fallback vocab (no merges file)
    out = tok.tokenize(["hello world", "a cat sat on the mat"])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot
    # eot present
    assert (out[0] == tok.eot).any()
    # decode inverts encode for ascii text
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    # truncation keeps eot
    long = " ".join(["word"] * 200)
    t = tok.tokenize(long)
    assert t.shape == (1, 77) and t[0, -1] == tok.eot


def test_clip_train_step(mesh, rng):
    model = build_model({
        "name": "CLIP", "embed_dim": 32, "image_resolution": 32,
        "vision_layers": 2, "vision_width": 64, "vision_patch_size": 8,
        "context_length": 16, "vocab_size": 256,
        "transformer_width": 32, "transformer_heads": 4, "transformer_layers": 2,
    })
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.rand(8, 32, 32, 3), jnp.float32),
        "text": jnp.asarray(rs.randint(1, 255, (8, 16)), jnp.int32),
    }
    variables = jax.jit(functools.partial(model.init, train=True))({"params": rng}, batch)
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    opt = build_optimizer({"name": "AdamW", "weight_decay": 0.2,
                           "one_dim_param_no_weight_decay": True}, params)
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 3e-4}, 1, 1)
    state = TrainState.create(params, ms, opt.init(params), rng)
    step = jax.jit(make_train_step(model, opt, lr_fn), donate_argnums=0)
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # logit scale stays clamped
    assert float(m["logit_scale"]) <= 100.0


def test_clip_modified_resnet_tower(mesh, rng):
    model = build_model({
        "name": "CLIP", "embed_dim": 32, "image_resolution": 32,
        "vision_layers": (1, 1, 1, 1), "vision_width": 16,
        "context_length": 8, "vocab_size": 128,
        "transformer_width": 32, "transformer_heads": 4, "transformer_layers": 1,
    })
    rs = np.random.RandomState(1)
    batch = {
        "image": jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32),
        "text": jnp.asarray(rs.randint(1, 127, (4, 8)), jnp.int32),
    }
    variables = jax.jit(functools.partial(model.init, train=True))({"params": rng}, batch)
    out = model.apply(variables, batch, train=True, mutable=["batch_stats"])[0]
    assert np.isfinite(float(out["loss"]))
