"""Data pipeline: record store, batching, binarization, host loader.

TPU-native replacement for the reference's L1 layer (SURVEY.md §1):
``IndexedDataset`` (``NeuralSeq/utils/indexed_datasets.py``), the
preprocess/binarize scripts (``data_gen/tts/base_binarizer.py``), and the
torch DataLoader + DistributedSampler input pipeline.
"""

from audiogpt_tpu.data.batching import (
    BucketSpec, EndlessSampler, batch_by_size, collate_1d, collate_2d,
    ordered_indices,
)
from audiogpt_tpu.data.binarizer import (
    BinarizeConfig, EmotionBinarizer, Item, SVSBinarizer, SVSItem,
    TTSBinarizer, ZhBinarizer, items_from_csv, load_emo_map,
    load_phone_encoder, load_split, load_word_encoder, mel2ph_from_durations,
)
from audiogpt_tpu.data.loader import (ArrayDataLoader, TTSDataLoader,
    VocoderDataLoader, collate_audio_text, collate_mel_image,
    collate_mixture, collate_motion, collate_tagging, collate_tts,
    collate_vocoder, prefetch)
from audiogpt_tpu.data.records import RecordDataset, RecordWriter
from audiogpt_tpu.data.textgrid import (is_sil_phoneme, mel2ph_from_textgrid,
    parse_textgrid)

__all__ = [
    "BucketSpec", "EndlessSampler", "batch_by_size", "collate_1d",
    "collate_2d", "ordered_indices", "BinarizeConfig", "Item",
    "TTSBinarizer", "SVSBinarizer", "SVSItem", "EmotionBinarizer",
    "ZhBinarizer", "items_from_csv", "load_emo_map", "load_phone_encoder",
    "load_split", "load_word_encoder",
    "mel2ph_from_durations", "ArrayDataLoader", "TTSDataLoader",
    "VocoderDataLoader", "collate_audio_text", "collate_mel_image",
    "collate_mixture", "collate_motion", "collate_tagging", "collate_tts",
    "collate_vocoder", "prefetch",
    "RecordDataset", "RecordWriter",
    "is_sil_phoneme", "mel2ph_from_textgrid", "parse_textgrid",
]
