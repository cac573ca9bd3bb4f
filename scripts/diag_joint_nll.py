"""Diagnose the rich10k joint fine-tune divergence: measure the SS reader's
frame NLL under the exact input regimes the two trainers use."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import dataclasses
import jax
import jax.numpy as jnp

from parrot_tpu.config import DataConfig
from parrot_tpu.data import H5Corpus
from parrot_tpu.data.pipeline import parrot_stream
from parrot_tpu.models.parrot import Parrot
from parrot_tpu.train.checkpoint import load_for_inference

model, params, norm, cfg, step = load_for_inference("runs/rich", "rich10k_reader", "best")
print("loaded step", step, "noise", cfg.model.feedback_noise_level)
# force the plain lax.scan path on CPU
model = Parrot(dataclasses.replace(cfg.model, pallas_scan=False))
corpus = H5Corpus("data/rich10k.h5")

def probe(bs, seq, mtl, tag):
    dcfg = DataConfig(dataset="data/rich10k.h5", batch_size=bs, seq_size=seq,
                      max_text_len=mtl, shuffle_seed=1234)
    it = iter(parrot_stream(corpus, dcfg, split="train", training=True, epochs=1))
    batch = next(it)
    st = model.init_state(bs, mtl)
    f = jax.jit(lambda p, b, r: model.compute_cost(p, norm, b, st, rng=r)[0])
    l_clean = f(params, batch, None)
    l_noise = f(params, batch, jax.random.PRNGKey(7))
    print(f"{tag}: B={bs} S={seq} U={mtl}  clean={float(l_clean):.3f}  "
          f"noise0.75={float(l_noise):.3f}")

probe(16, 20, 256, "joint-style")
probe(16, 50, 40, "reader-shape-small")

print("--- carried-state trajectory, no updates (joint shapes) ---")
dcfg = DataConfig(dataset="data/rich10k.h5", batch_size=16, seq_size=20,
                  max_text_len=256, shuffle_seed=1234)
it = iter(parrot_stream(corpus, dcfg, split="train", training=True, epochs=1))
st = model.init_state(16, 256)
f = jax.jit(lambda p, b, s, r: model.compute_cost(p, norm, b, s, rng=r)[:2])
import itertools
for i, batch in enumerate(itertools.islice(it, 30)):
    l, st = f(params, batch, st, None)
    print(f"seg {i:2d} start={float(batch.start_flag):.0f} nll={float(l):8.3f}")
