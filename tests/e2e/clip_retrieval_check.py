"""CLIP learning check: held-out zero-shot-style retrieval.

Loads the e2e-pretrained tiny CLIP, embeds 512 HELD-OUT structured
images (disjoint index range) and the 10 class captions, and scores
text->class R@1: each image must rank its own class's caption first.
Chance = 0.10; the pass bar (>0.5) matches the other learning checks.
Reference intent: CLIP zero-shot protocol (CLIPWrapper + tokenizer).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from passl_tpu.data.datasets import StructuredTextImageDataset
from passl_tpu.data.tokenizer import SimpleTokenizer
from passl_tpu.models import build_model
from passl_tpu.utils import cfg_util


def main(cfg_path: str, ckpt: str) -> int:
    cfg = cfg_util.get_config(cfg_path)
    model = build_model(dict(cfg["Model"]))
    state = serialization.msgpack_restore(open(ckpt, "rb").read())
    params = state["params"]

    # held-out images: disjoint index range, eval-style transform
    ds = StructuredTextImageDataset(
        size=512, image_size=32, num_classes=10, noise=0.2,
        context_length=32, index_offset=100000,
        transform=[{"NormalizeImage": {"scale": 0.00392157,
                                       "mean": [0.5, 0.5, 0.5],
                                       "std": [0.25, 0.25, 0.25]}}])
    images = np.stack([ds[i]["image"] for i in range(len(ds))])
    labels = np.arange(512) % 10  # gidx % num_classes with offset 100000 % 10 == 0

    tok = SimpleTokenizer(context_length=32)
    captions = [f"a photo of a {w}" for w in ds.CLASS_WORDS[:10]]
    texts = tok.tokenize(captions)

    variables = {"params": params}

    @jax.jit
    def embed(img, txt):
        im = model.apply(variables, img, method=model.encode_image)
        tx = model.apply(variables, txt, method=model.encode_text)
        im = im / jnp.linalg.norm(im, axis=-1, keepdims=True)
        tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        return im, tx

    im, tx = embed(jnp.asarray(images, jnp.float32), jnp.asarray(texts))
    sim = np.asarray(im @ tx.T)                       # [512, 10]
    pred = sim.argmax(axis=1)
    r1 = float((pred == labels).mean())
    print(f"FINAL retrieval R@1: {r1:.4f} (chance = 0.10)")
    return 0 if r1 > 0.5 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
