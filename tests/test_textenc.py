"""BERT / CLAP text tower parity vs HF transformers BertModel."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audiogpt_tpu.models.textenc import BertConfig, BertEncoder, CLAPTextConfig, CLAPTextEncoder
from audiogpt_tpu.models.textenc.clap import WordPieceTokenizer
from audiogpt_tpu.utils.torch_import import convert_bert

TINY = BertConfig(vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
                  intermediate_size=64, max_position=64)


@pytest.fixture(scope="module")
def pair():
    from transformers import BertConfig as HFConfig, BertModel

    hf = HFConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    ref = BertModel(hf, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_bert(sd, TINY)
    return ref, BertEncoder(TINY), params


class TestBertParity:
    def test_hidden_states_match(self, pair):
        ref, model, params = pair
        rng = np.random.RandomState(0)
        ids = rng.randint(0, 1000, (2, 12))
        mask = np.ones((2, 12), np.int64)
        mask[1, 8:] = 0
        with torch.no_grad():
            y_ref = ref(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
        y = np.asarray(model.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
        # padded positions may differ (masked out downstream); compare valid
        np.testing.assert_allclose(y[0], y_ref[0], atol=2e-4)
        np.testing.assert_allclose(y[1, :8], y_ref[1, :8], atol=2e-4)


class TestCLAPText:
    def test_context_shape(self):
        import jax

        cfg = CLAPTextConfig(bert=TINY, d_proj=48)
        model = CLAPTextEncoder(cfg)
        toks = jnp.zeros((2, 16), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), toks)
        ctx = model.apply(params, toks)
        assert ctx.shape == (2, 16, 48)
        cls = model.apply(params, toks, method=CLAPTextEncoder.cls_embedding)
        assert cls.shape == (2, 48)


class TestWordPiece:
    def test_with_vocab(self, tmp_path):
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "wor", "##ld", "!"]
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(vocab) + "\n")
        tok = WordPieceTokenizer(str(p))
        ids, mask = tok.encode("hello world!", max_length=10)
        assert ids[0] == 2  # CLS
        assert list(ids[1:5]) == [4, 5, 6, 7]
        assert ids[5] == 3  # SEP
        assert mask.sum() == 6

    def test_default_loads_bundled_derived_vocab(self):
        """Out-of-box default = the bundled derived WordPiece vocab
        (text/data/wordpiece_en.txt.gz): linguistic pieces, BERT special
        ids, no hash-bucket warning."""
        import warnings

        tok = WordPieceTokenizer()
        assert tok.derived and tok.vocab_size == 30522
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ids, mask = tok.encode("a dog barking in the distance",
                                   max_length=16)
        assert ids[0] == 101 and ids[mask.sum() - 1] == 102  # [CLS]...[SEP]
        body = [int(i) for i in ids[1: mask.sum() - 1]]
        assert all(i != 100 for i in body), "no [UNK] on plain English"
        assert all(i < tok.vocab_size for i in body)
        # decode round-trips the words
        assert tok.decode(ids[: mask.sum()]) == "a dog barking in the distance"

    def test_fallback_small_table(self):
        """A model whose embedding table is smaller than the bundled vocab
        (tiny test configs) still gets the hash-bucket fallback."""
        tok = WordPieceTokenizer(vocab_size=500)
        assert not tok.derived and not tok.vocab
        ids, mask = tok.encode("anything goes", max_length=8)
        assert ids.shape == (8,) and ids[0] == 101 and mask[0] == 1
        assert max(int(i) for i in ids) < 500


class TestHTSAT:
    """Swin-audio CLAP tower (open_clap/htsat.py)."""

    TINY_HTSAT = None  # built lazily (MelSpec import inside tests)

    @staticmethod
    def _tiny_cfg(d_proj=32):
        from audiogpt_tpu.dsp.mel import MelSpec
        from audiogpt_tpu.models.textenc.htsat import HTSATConfig

        mel = MelSpec(32000, 1024, 320, 1024, 16, 50.0, 14000.0,
                      power=2.0, pad_mode="reflect", log="db10", amin=1e-10)
        return HTSATConfig(mel=mel, spec_size=64, patch=4, window=8,
                           embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                           num_classes=10, d_proj=d_proj)

    def test_embedding_shape(self):
        import jax
        import numpy as np
        from audiogpt_tpu.models.textenc.htsat import HTSATAudioEncoder

        model = HTSATAudioEncoder(self._tiny_cfg())
        wav = jax.random.normal(jax.random.PRNGKey(0), (2, 32000)) * 0.1
        params = model.init(jax.random.PRNGKey(1), wav)
        z = model.apply(params, wav)
        assert z.shape == (2, 32)
        assert np.isfinite(np.asarray(z)).all()
        # different audio → different embedding
        wav2 = jax.random.normal(jax.random.PRNGKey(9), (2, 32000)) * 0.1
        z2 = model.apply(params, wav2)
        assert np.abs(np.asarray(z) - np.asarray(z2)).max() > 1e-5

    def test_scorer_with_htsat(self):
        import numpy as np
        from audiogpt_tpu.models.textenc.bert import BertConfig
        from audiogpt_tpu.models.textenc.clap import CLAPScorer, CLAPTextConfig

        cfg = CLAPTextConfig(bert=BertConfig(vocab_size=200, hidden_size=16,
                                             num_layers=1, num_heads=2,
                                             intermediate_size=32), d_proj=32)
        scorer = CLAPScorer(cfg, audio_tower="htsat", sample_rate=32000,
                            audio_cfg=self._tiny_cfg())
        wavs = np.random.default_rng(0).normal(size=(3, 32000)).astype(
            np.float32) * 0.1
        scores = scorer.score("a dog barking", wavs)
        assert scores.shape == (3,) and np.isfinite(scores).all()
        assert 0 <= scorer.select_best("a dog barking", wavs) < 3
