"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver benches on the real TPU chip; tests exercise the same code
paths (Pallas kernels in interpreter mode, shardings over 8 virtual CPU
devices) without per-test TPU compile/tunnel latency.

Note: the axon TPU plugin ignores ``JAX_PLATFORMS`` env, so we must force
the platform through ``jax.config`` before the backend initializes.
"""

import os

# Must be set before the XLA backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_model_dir(tmp_path_factory):
    """A tiny randomly-initialized GPT-2 + locally-trained ByteLevel BPE
    tokenizer, saved as a real HF model directory. The zero-egress
    analogue of the reference's downloaded-GGUF gated tests
    (pytests/test_embed_gguf.py:23-37): exercises the real Flax
    model-loading code paths without network access."""
    d = tmp_path_factory.mktemp("tiny_gpt2")
    from tokenizers import ByteLevelBPETokenizer
    from transformers import GPT2Config, GPT2TokenizerFast, FlaxGPT2LMHeadModel

    corpus = [
        '{"entities": [{"name": "Ada Lovelace", "type": "PERSON"}]}',
        '{"relations": [{"head": "Ada", "relation": "wrote", "tail": "Notes"}]}',
        "Ada Lovelace wrote the first program. Turing founded the field.",
        'json {} [] "name" "type" "head" "relation" "tail" entities relations',
    ]
    bt = ByteLevelBPETokenizer()
    bt.train_from_iterator(corpus, vocab_size=384, min_frequency=1,
                           special_tokens=["<|endoftext|>"])
    bt.save_model(str(d))
    tok = GPT2TokenizerFast(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt"),
        bos_token="<|endoftext|>", eos_token="<|endoftext|>",
        unk_token="<|endoftext|>",
    )
    tok.save_pretrained(str(d))
    cfg = GPT2Config(
        vocab_size=tok.vocab_size, n_positions=512, n_embd=32,
        n_layer=2, n_head=2,
        bos_token_id=tok.bos_token_id, eos_token_id=tok.eos_token_id,
    )
    model = FlaxGPT2LMHeadModel(cfg, seed=0)
    model.save_pretrained(str(d))
    return str(d)
