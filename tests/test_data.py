"""Data pipeline tests: record store, batching policy, f0/CWT, binarizer,
loader static shapes. (SURVEY.md §4: the reference has no tests — this is the
test pyramid it lacked.)"""

import numpy as np
import pytest

from audiogpt_tpu.data import (
    BucketSpec, EndlessSampler, Item, RecordDataset, RecordWriter,
    TTSBinarizer, TTSDataLoader, batch_by_size, collate_tts,
    load_phone_encoder, load_split, mel2ph_from_durations, ordered_indices,
)
from audiogpt_tpu.data.binarizer import BinarizeConfig
from audiogpt_tpu.dsp import f0 as f0lib


# -- records ---------------------------------------------------------------

def test_record_roundtrip(tmp_path):
    prefix = str(tmp_path / "train")
    recs = [
        {"mel": np.random.randn(17, 4).astype(np.float32),
         "tokens": np.arange(5, dtype=np.int32),
         "item_name": f"it{i}", "len": 17, "sec": 0.5}
        for i in range(7)
    ]
    with RecordWriter(prefix) as w:
        for r in recs:
            w.add(r)
    ds = RecordDataset(prefix)
    assert len(ds) == 7
    got = ds[3]
    np.testing.assert_array_equal(got["mel"], recs[3]["mel"])
    np.testing.assert_array_equal(got["tokens"], recs[3]["tokens"])
    assert got["item_name"] == "it3" and got["len"] == 17
    # random access out of order
    assert ds[6]["item_name"] == "it6"
    assert ds[0]["item_name"] == "it0"


def test_record_rejects_object_dtype(tmp_path):
    w = RecordWriter(str(tmp_path / "x"))
    with pytest.raises(TypeError):
        w.add({"bad": np.asarray([{"a": 1}], dtype=object)})


# -- batching --------------------------------------------------------------

def test_ordered_indices_stable_sort():
    sizes = [5, 3, 5, 3, 5, 9]
    idx = ordered_indices(sizes, shuffle=True, seed=0)
    got_sizes = [sizes[i] for i in idx]
    assert got_sizes == sorted(sizes)


def test_batch_by_size_budget():
    sizes = {i: s for i, s in enumerate([10, 10, 10, 20, 20, 30, 30, 40])}
    batches = batch_by_size(list(range(8)), lambda i: sizes[i],
                            max_tokens=60, max_sentences=4)
    # every batch obeys the (len(batch) * max_item_len) <= max_tokens rule
    for b in batches:
        assert len(b) <= 4
        assert len(b) * max(sizes[i] for i in b) <= 60
    assert sorted(i for b in batches for i in b) == list(range(8))


def test_batch_by_size_multiple():
    batches = batch_by_size(list(range(10)), lambda i: 10,
                            max_tokens=45, max_sentences=None,
                            required_batch_size_multiple=2)
    assert all(len(b) % 2 == 0 or b is batches[-1] for b in batches)


def test_endless_sampler_sharding():
    s0 = EndlessSampler(10, seed=3, shard=0, num_shards=2)
    s1 = EndlessSampler(10, seed=3, shard=1, num_shards=2)
    e0, e1 = s0.epoch_indices(4), s1.epoch_indices(4)
    assert sorted(list(e0) + list(e1)) == list(range(10))
    # deterministic across constructions
    np.testing.assert_array_equal(e0, EndlessSampler(10, 3, 0, 2).epoch_indices(4))


def test_bucketspec():
    spec = BucketSpec.dyadic(max_len=1024, max_batch=16, min_len=128)
    assert spec.round_len(1) == 128
    assert spec.round_len(129) == 256
    assert spec.round_len(4000) == 1024
    assert spec.round_batch(3) == 4


# -- f0 / cwt --------------------------------------------------------------

def test_estimate_f0_sine():
    sr, hz = 22050, 220.0
    t = np.arange(sr) / sr
    wav = np.sin(2 * np.pi * hz * t).astype(np.float32)
    f0, uv = f0lib.estimate_f0(wav, sr=sr, hop=256)
    f0 = np.asarray(f0)
    voiced = f0[np.asarray(uv) > 0]
    # interior frames should lock onto 220 Hz within 3%
    assert voiced.size > 40
    assert abs(np.median(voiced) - hz) / hz < 0.03


def test_estimate_f0_silence():
    wav = np.zeros(22050, np.float32)
    f0, uv = f0lib.estimate_f0(wav, sr=22050, hop=256)
    assert np.asarray(uv).sum() == 0


def test_f0_to_coarse_range():
    f0 = np.asarray([0.0, 50.0, 220.0, 1100.0])
    c = f0lib.f0_to_coarse(f0)
    assert c.min() >= 1 and c.max() <= 255
    assert c[1] < c[2] < c[3]


def test_continuous_f0_interpolates():
    f0 = np.asarray([0, 0, 100, 0, 0, 200, 0], np.float32)
    uv, cont = f0lib.continuous_f0(f0)
    np.testing.assert_array_equal(uv, [0, 0, 1, 0, 0, 1, 0])
    assert cont[0] == 100 and cont[-1] == 200
    assert 100 < cont[3] < 200 and 100 < cont[4] < 200


def test_cwt_shapes_and_inverse_correlation():
    rng = np.random.default_rng(0)
    n = 256
    # smooth lf0-like signal
    x = np.cumsum(rng.normal(size=n)) * 0.05
    x = (x - x.mean()) / x.std()
    W, scales = f0lib.cwt_lf0(x)
    assert W.shape == (n, 10) and len(scales) == 10
    rec = f0lib.inverse_cwt(W[None])[0]
    # the reference's fixed-weight inverse is approximate: demand strong
    # correlation with the input, not equality
    corr = np.corrcoef(rec[8:-8], x[8:-8])[0, 1]
    assert corr > 0.85


def test_cwt2f0_roundtrip():
    n = 200
    t = np.arange(n)
    f0 = 200 + 40 * np.sin(2 * np.pi * t / 80)
    uv, lf0 = f0lib.continuous_lf0(f0)
    m, s = lf0.mean(), lf0.std()
    W, _ = f0lib.cwt_lf0((lf0 - m) / s)
    Wn, _, _ = f0lib.norm_scale(W)
    # norm_scale then cwt2f0 with per-utt stats: check magnitude sanity
    f0_rec = f0lib.cwt2f0(Wn[None], np.asarray([m]), np.asarray([s]))[0]
    assert f0_rec.shape == (n,)
    assert 100 < np.median(f0_rec) < 400


# -- binarizer + loader ----------------------------------------------------

def _toy_items(n=12, sr=22050):
    rng = np.random.default_rng(0)
    texts = ["hello world", "the quick brown fox", "jumps over", "a lazy dog"]
    items = []
    for i in range(n):
        dur = 0.3 + 0.1 * (i % 4)
        t = np.arange(int(sr * dur)) / sr
        wav = 0.3 * np.sin(2 * np.pi * (150 + 20 * (i % 5)) * t)
        wav += 0.01 * rng.normal(size=len(t))
        items.append(Item(name=f"it{i}", wav=wav.astype(np.float32),
                          text=texts[i % 4], spk=f"spk{i % 2}"))
    return items


def test_binarize_and_load(tmp_path):
    out = str(tmp_path / "bin")
    cfg = BinarizeConfig(with_f0=True, with_f0cwt=True)
    counts = TTSBinarizer(cfg).binarize(_toy_items(), out)
    assert counts["train"] >= 8 and counts["valid"] >= 1
    ds = load_split(out, "train")
    rec = ds[0]
    assert rec["mel"].shape[1] == 80
    assert rec["tokens"].dtype == np.int32
    assert rec["f0"].shape[0] == rec["mel"].shape[0]
    assert rec["cwt_spec"].shape == (rec["mel"].shape[0], 10)
    enc = load_phone_encoder(out)
    assert enc.encode(rec["ph"].split(" "))  # vocab covers stored phones

    spec = BucketSpec.dyadic(max_len=512, max_batch=8, min_len=32)
    loader = TTSDataLoader(ds, max_tokens=2000, max_sentences=4, spec=spec)
    batch = next(iter(loader))
    B, L = batch["mels"].shape[:2]
    assert B in spec.batch_buckets and L in spec.length_buckets
    assert batch["txt_tokens"].shape[0] == B
    assert batch["weight"].sum() <= B
    # padded dummy rows are zero-weight
    real = int(batch["weight"].sum())
    assert np.all(batch["weight"][:real] == 1)


def test_loader_multihost_split(tmp_path):
    out = str(tmp_path / "bin")
    TTSBinarizer(BinarizeConfig(with_f0=False)).binarize(_toy_items(8), out)
    ds = load_split(out, "train")
    l0 = TTSDataLoader(ds, max_tokens=500, max_sentences=2, shard=0, num_shards=2)
    l1 = TTSDataLoader(ds, max_tokens=500, max_sentences=2, shard=1, num_shards=2)
    b0 = l0.batches_for_epoch(0)
    b1 = l1.batches_for_epoch(0)
    all_batches = TTSDataLoader(ds, max_tokens=500, max_sentences=2).batches_for_epoch(0)
    assert b0 == all_batches[0::2] and b1 == all_batches[1::2]


def test_mel2ph_from_durations():
    m = mel2ph_from_durations([2, 3, 1], 8)
    np.testing.assert_array_equal(m, [1, 1, 2, 2, 2, 3, 0, 0])


def test_vocoder_collate_and_loader(tmp_path):
    from audiogpt_tpu.data import VocoderDataLoader, collate_vocoder

    out = str(tmp_path / "bin")
    cfg = BinarizeConfig(with_f0=False, with_wav=True)
    TTSBinarizer(cfg).binarize(_toy_items(8), out)
    ds = load_split(out, "train")
    hop = cfg.mel.hop
    samples = [ds[i] for i in range(min(4, len(ds)))]
    batch = collate_vocoder(samples, segment_frames=16, hop=hop,
                            rng=np.random.default_rng(0), batch_round=8)
    assert batch["mels"].shape == (8, 16, 80)
    assert batch["wav"].shape == (8, 16 * hop)
    assert batch["weight"].sum() == len(samples)

    loader = VocoderDataLoader(ds, segment_frames=16, hop=hop, batch_size=4)
    b = next(iter(loader))
    assert b["mels"].shape == (4, 16, 80) and b["wav"].shape == (4, 16 * hop)
    # crops are wav/mel aligned in length
    assert np.isfinite(b["wav"]).all()


def test_binarizer_style_embed(tmp_path):
    out = str(tmp_path / "bin")
    cfg = BinarizeConfig(with_f0=False, with_style_embed=True)
    TTSBinarizer(cfg).binarize(_toy_items(4), out)
    rec = load_split(out, "train")[0]
    assert rec["spk_embed"].shape == (256,)
    assert rec["emo_embed"].shape == (256,)
    assert np.isfinite(rec["spk_embed"]).all()


def test_binarizer_energy(tmp_path):
    out = str(tmp_path / "bin")
    cfg = BinarizeConfig(with_f0=False, with_energy=True)
    TTSBinarizer(cfg).binarize(_toy_items(4), out)
    rec = load_split(out, "train")[0]
    assert rec["energy"].shape == (rec["mel"].shape[0],)
    assert (rec["energy"] >= 0).all()


def test_wav_processors_pipeline():
    """wav_processors stage (reference data_gen/tts/wav_processors): trim,
    loudness normalize, long-silence capping, resample — composed by name."""
    import numpy as np
    from audiogpt_tpu.data.wav_processors import (
        WAV_PROCESSORS, apply_processors,
    )

    sr = 16000
    rng = np.random.default_rng(0)
    speech = rng.normal(size=sr).astype(np.float32) * 0.3
    pad = np.zeros(sr, np.float32)
    wav = np.concatenate([pad, speech, pad, pad, pad, speech, pad])

    # edge trim removes leading/trailing silence
    out, _ = apply_processors(["trim_sil"], wav, sr)
    assert len(out) < len(wav)
    assert np.abs(out[:2048]).max() > 0  # speech at the head now

    # long internal silence capped: the 3 s gap shrinks
    out2, _ = apply_processors(["trim_long_sil"], wav, sr)
    assert len(out2) < len(wav) - sr  # dropped over a second of silence
    # energy preserved (speech kept)
    assert np.square(out2).sum() > 0.9 * np.square(wav).sum()
    # the kept gap respects the named parameter TOTAL (ADVICE r1: the old
    # per-side dilation kept up to 2x): default 12 x 30 ms = 360 ms, plus
    # smoothing slack — well under the former 720 ms+
    silent = np.abs(out2) < 1e-6
    runs, cur = [], 0
    for s in silent:
        cur = cur + 1 if s else 0
        runs.append(cur)
    max_gap_ms = max(runs) * 1000 / sr
    assert max_gap_ms <= (12 + 8) * 30 + 1, max_gap_ms

    # loudness normalization hits the target active RMS within 3 dB
    out3, _ = apply_processors(["loudness_norm"], speech * 0.01, sr)
    db = 20 * np.log10(np.sqrt(np.mean(out3 ** 2)) + 1e-12)
    assert -26.0 < db < -14.0

    # resample halves the length
    out4, sr4 = apply_processors(["resample"], wav, sr,
                                 options={"resample": {"target_sr": 8000}})
    assert sr4 == 8000 and abs(len(out4) - len(wav) // 2) < 10

    # unknown name raises
    import pytest
    with pytest.raises(KeyError):
        apply_processors(["nope"], wav, sr)
    assert {"resample", "trim_sil", "loudness_norm",
            "trim_long_sil"} <= set(WAV_PROCESSORS)


def test_binarizer_wav_processors(tmp_path):
    import numpy as np
    from audiogpt_tpu.data import TTSBinarizer, load_split
    from audiogpt_tpu.data.binarizer import BinarizeConfig, Item

    sr = 22050
    rng = np.random.default_rng(0)
    speech = rng.normal(size=sr // 2).astype(np.float32) * 0.2
    wav = np.concatenate([np.zeros(sr, np.float32), speech,
                          np.zeros(sr, np.float32)])
    items = [Item(name=f"u{i}", wav=wav, text="hello world") for i in range(4)]
    cfg = BinarizeConfig(with_f0=False,
                         wav_processors=("trim_sil", "loudness_norm"))
    TTSBinarizer(cfg).binarize(items, str(tmp_path))
    ds = load_split(str(tmp_path), "train")
    rec = ds[0]
    # trimmed: far fewer mel frames than the raw 2.5 s
    assert rec["mel"].shape[0] < (len(wav) / 256) * 0.7


def test_svs_binarizer_to_diffsinger_step(tmp_path):
    """SVS score binarization (absent from the reference tree) feeding the
    DiffSinger-MIDI recipe end-to-end: opencpop-style scored items →
    records with pitch_midi/midi_dur/is_slur → collated batch → one
    finite train step with MIDI conditioning."""
    import jax
    import numpy as np
    from audiogpt_tpu.data import SVSBinarizer, SVSItem, load_split
    from audiogpt_tpu.data.binarizer import BinarizeConfig, load_phone_encoder
    from audiogpt_tpu.data.loader import collate_tts

    sr = 24000
    rng = np.random.default_rng(0)
    scores = [
        ("xiao jiu wo", "C#4/Db4 | F#4/Gb4 | G#4/Ab4",
         "0.4071 | 0.3761 | 0.2421"),
        ("ni hao SP", "A4 | B4 | rest", "0.3 | 0.3 | 0.1"),
    ] * 4
    items = [SVSItem(name=f"s{i}", wav=rng.normal(size=sr // 3
                                                  ).astype(np.float32) * 0.1,
                     text=t, notes=n, notes_duration=d)
             for i, (t, n, d) in enumerate(scores)]
    from audiogpt_tpu.dsp.mel import NEURALSEQ_MEL_24K

    cfg = BinarizeConfig(mel=NEURALSEQ_MEL_24K, with_f0=True)
    counts = SVSBinarizer(cfg).binarize(items, str(tmp_path))
    assert counts["train"] >= 4
    ds = load_split(str(tmp_path), "train")
    rec = ds[0]
    assert len(rec["pitch_midi"]) == len(rec["tokens"])
    assert len(rec["midi_dur"]) == len(rec["tokens"])
    assert rec["is_slur"].max() <= 1
    assert rec["pitch_midi"].max() > 40       # real notes present
    enc = load_phone_encoder(str(tmp_path))
    assert len(enc) > 6

    batch = collate_tts([ds[i % len(ds)] for i in range(8)], None, 80)
    assert batch["pitch_midi"].shape == batch["txt_tokens"].shape
    assert batch["midi_dur"].dtype == np.float32

    # one DiffSinger-MIDI train step on the real batch
    from audiogpt_tpu.models.svs.diffsinger import (
        DiffNetConfig, DiffSingerConfig,
    )
    from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
    from audiogpt_tpu.train import Trainer, TrainerConfig
    from audiogpt_tpu.train.optim import OptimConfig
    from audiogpt_tpu.train.tasks import DiffSingerTask, DiffSingerTaskConfig

    mcfg = DiffSingerConfig(
        fs2=FastSpeech2Config(vocab_size=len(enc), hidden_size=16,
                              enc_layers=1, dec_layers=1, num_heads=2,
                              enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
                              n_mels=80, dur_predictor_layers=1,
                              predictor_layers=1, predictor_hidden=8,
                              use_midi=True, rel_pos=True,
                              use_pitch_embed=False, max_frames=256),
        net=DiffNetConfig(residual_layers=2, residual_channels=8,
                          encoder_hidden=16, mel_bins=80),
        timesteps=10, K_step=10,
        spec_min=(-6.0,) * 80, spec_max=(1.5,) * 80)
    task = DiffSingerTask(DiffSingerTaskConfig(
        model=mcfg, optim=OptimConfig(schedule="constant", lr=1e-3)))
    tcfg = TrainerConfig(work_dir=str(tmp_path / "exp"), max_updates=2,
                         val_check_interval=100, log_interval=1,
                         num_sanity_val_steps=0, use_tensorboard=False)

    def gen():
        while True:
            yield batch

    state = Trainer(task, tcfg).fit(gen())
    assert int(jax.device_get(state["step"])) == 2


# -- emotion / zh binarizers (reference base_binarizer_emotion.py:28,
# binarizer_zh.py:12) -------------------------------------------------------

def test_emotion_binarizer(tmp_path):
    from audiogpt_tpu.data import EmotionBinarizer, load_emo_map

    items = _toy_items(8)
    for i, it in enumerate(items):
        it.emotion = ["Neutral", "Happy", "Sad", "Angry"][i % 4]
    out = str(tmp_path / "bin")
    cfg = BinarizeConfig(with_f0=True, with_style_embed=True)
    counts = EmotionBinarizer(cfg).binarize(items, out)
    assert counts["train"] >= 1

    emo_map = load_emo_map(out)
    assert emo_map == {"Angry": 0, "Happy": 1, "Neutral": 2, "Sad": 3}
    ds = load_split(out, "train")
    recs = [ds[i] for i in range(len(ds))]
    assert {int(r["emo_id"]) for r in recs} <= set(emo_map.values())
    assert len({int(r["emo_id"]) for r in recs}) > 1
    assert recs[0]["emo_embed"].shape == recs[0]["spk_embed"].shape

    # collate passes the emotion fields through with static shapes
    batch = collate_tts(recs[:3], None, n_mels=80)
    assert batch["emo_ids"].shape == (3,)
    assert batch["emo_embed"].shape[0] == 3


def test_zh_binarizer_duration_rules(tmp_path):
    from audiogpt_tpu.data import ZhBinarizer

    zb = ZhBinarizer(BinarizeConfig(with_f0=True))
    # rule 1: separator's leading VOICED frames go to the previous final,
    # remainder >= threshold survives; rule 2: initial+final split evenly
    phones = ["x", "iao3", "|"]
    dur = np.asarray([10, 20, 120])
    f0 = np.concatenate([np.full(30, 200.0),        # x + iao3 voiced
                         np.full(5, 180.0),         # separator leading voiced
                         np.zeros(115)])
    fixed = zb._fix_durations(dur, phones, f0)
    assert fixed.sum() == dur.sum()
    assert fixed[2] == 115                          # kept (>= 100 frames)
    assert fixed[0] + fixed[1] == 35 and abs(int(fixed[0]) - int(fixed[1])) <= 1

    # short separator collapses entirely into the final
    fixed2 = zb._fix_durations(np.asarray([10, 20, 60]), phones,
                               np.concatenate([np.full(30, 200.0),
                                               np.zeros(60)]))
    assert fixed2[2] == 0 and fixed2.sum() == 90

    # end-to-end: hanzi text through ZhTTSFrontend → record with rebuilt
    # consistent mel2ph
    sr = 22050
    t = np.arange(int(sr * 0.6)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    items = [Item(name=f"zh{i}", wav=wav, text="你好世界。") for i in range(3)]
    out = str(tmp_path / "binzh")
    counts = zb.binarize(items, out)
    ds = load_split(out, "train")
    rec = ds[0]
    phs = rec["ph"].split(" ")
    assert any(p in ("n", "h", "sh", "j") for p in phs)  # initials present
    if "mel2ph" in rec:
        assert rec["mel2ph"].max() <= len(phs)


def test_items_from_csv(tmp_path):
    from audiogpt_tpu.data import items_from_csv

    wavs = {}
    for n in ("a1", "a2"):
        p = str(tmp_path / f"{n}.npy")
        np.save(p, np.zeros(100, np.float32))
        wavs[n] = p
    csv_path = str(tmp_path / "metadata_phone.csv")
    with open(csv_path, "w") as f:
        f.write("item_name,txt,ph,wav_fn,spk_name,others\n")
        f.write(f'a1,hello,HH AH0 L OW1,{wavs["a1"]},spkA,"Happy"\n')
        f.write(f'a2,world,W ER1 L D,{wavs["a2"]},,\n')
    items = items_from_csv(csv_path, wav_loader=lambda p: np.load(p))
    assert [it.name for it in items] == ["a1", "a2"]
    assert items[0].phones == ["HH", "AH0", "L", "OW1"]
    assert items[0].emotion == "Happy" and items[0].spk == "spkA"
    assert items[1].emotion == "Neutral" and items[1].spk == "SPK1"
