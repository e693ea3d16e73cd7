"""Corpus feature composition: labels + vocoder analysis → training features.

Reference parity: ``percivaltts/compose.py`` (SURVEY.md §2 "Feature
composition", §3.1): per utterance in the file-id list, binarize the HTS
label via the question set and run vocoder analysis on the waveform; compute
corpus normalization statistics; produce normalized composed input ("lab")
and output ("cmp") features. The reference writes per-utterance binary files
between every stage; here features flow in memory into a ``Dataset`` (the
binary-file path is still available via ``save_features`` for
reference-compatible artifacts and caching).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from percivaltts_tpu.config import Configuration
from percivaltts_tpu.data.dataset import Dataset, split_fileids
from percivaltts_tpu import native
from percivaltts_tpu.data.hts_labels import (
    NUM_FRAME_FEATURES,
    QuestionSet,
    binarize_label_file,
)
from percivaltts_tpu.data.normalize import NormStats, compute_meanstd, compute_minmax
from percivaltts_tpu.utils.fileio import load_binary_file, save_binary_file
from percivaltts_tpu.utils.logging import print_log
from percivaltts_tpu.vocoders import get_vocoder


def load_wav(path: str) -> Tuple[int, np.ndarray]:
    """Load a wav file as float32 in [-1, 1].

    Accepts the encodings a Merlin-layout corpus may realistically carry
    (16/24-in-32/32-bit PCM, float32/64); anything else raises with the
    fix spelled out rather than silently mis-scaling (uint8 PCM would
    otherwise read as 0..255 "floats" — real-corpus readiness, VERDICT
    round-3 item 8)."""
    import scipy.io.wavfile as wavfile

    fs, x = wavfile.read(path)
    if x.dtype == np.int16:
        x = x.astype(np.float32) / 32768.0
    elif x.dtype == np.int32:
        x = x.astype(np.float32) / 2147483648.0
    elif x.dtype == np.float64:
        x = x.astype(np.float32)
    elif x.dtype != np.float32:
        raise ValueError(
            f"{path}: unsupported wav sample format {x.dtype} — convert the "
            "corpus to 16-bit PCM (e.g. `sox in.wav -b 16 out.wav`); "
            "supported: int16, int32, float32, float64"
        )
    if x.ndim > 1:
        x = x.mean(axis=1)
    return fs, x


def save_wav(path: str, fs: int, x: np.ndarray) -> None:
    import scipy.io.wavfile as wavfile

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    xi = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    wavfile.write(path, fs, (xi * 32767.0).astype(np.int16))


class ComposedCorpus:
    """The output of the compose stage: datasets + normalization stats."""

    def __init__(
        self,
        train: Dataset,
        valid: Dataset,
        test: Dataset,
        in_stats: NormStats,
        out_stats: NormStats,
    ):
        self.train = train
        self.valid = valid
        self.test = test
        self.in_stats = in_stats
        self.out_stats = out_stats

    def save_stats(self, workdir: str) -> None:
        os.makedirs(workdir, exist_ok=True)
        self.in_stats.save(os.path.join(workdir, "in_stats.npz"))
        self.out_stats.save(os.path.join(workdir, "out_stats.npz"))


def compose(
    cfg: Configuration,
    fileids: Optional[Sequence[str]] = None,
    cache_dir: Optional[str] = None,
    normalize: bool = True,
) -> ComposedCorpus:
    """Run the full composition stage over the corpus in ``cfg.data``.

    Normalization matches the reference: min/max for the binary-heavy label
    inputs, mean/std for the acoustic targets with the bounded noise-mask
    stream left un-rescaled. With ``normalize=False`` the datasets stay raw
    and the stats are applied on device inside the jitted train step
    (``training/ondevice.py``).
    """
    d = cfg.data
    voc = get_vocoder(cfg.vocoder)
    questions = QuestionSet.from_hed(d.question_file)
    shift_sec = cfg.vocoder.shift_ms / 1000.0

    if fileids is None:
        with open(d.fileids) as f:
            fileids = [line.strip() for line in f if line.strip()]

    # cache invalidation: features depend on the vocoder config and the
    # question set; a stale cache must never silently serve mismatched dims
    # or features extracted under different analysis parameters.
    if cache_dir:
        import dataclasses
        import json

        voc_meta = dataclasses.asdict(cfg.vocoder)
        # the voicing DECISION rules apply to predicted tracks at
        # generation time only — they do not change analysis output, so
        # flipping them must not invalidate extracted features (the
        # production preset sets vuv_pred_*, which silently recomposed
        # every preset run until round 5)
        for k in (
            "vuv_rule",
            "vuv_bap_bands",
            "vuv_bap_threshold",
            "vuv_pred_low_frac",
            "vuv_pred_threshold",
        ):
            voc_meta.pop(k, None)
        meta = {
            "vocoder": voc_meta,
            "question_file": os.path.abspath(d.question_file),
            "questions_dim": questions.dim,
        }
        meta_path = os.path.join(cache_dir, "cache_meta.json")
        stale = False
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                stale = json.load(f) != meta
        if stale:
            print_log("feature cache is stale (vocoder/question config changed); recomputing")
            for fn in os.listdir(cache_dir):
                if fn.endswith(".f32"):
                    os.remove(os.path.join(cache_dir, fn))
        os.makedirs(cache_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)

    qdim = questions.dim + NUM_FRAME_FEATURES
    labs: dict = {}
    cmps: dict = {}
    uncached: List[str] = []
    for uid in fileids:
        cached_lab = cache_dir and os.path.join(cache_dir, uid + ".lab.f32")
        cached_cmp = cache_dir and os.path.join(cache_dir, uid + ".cmp.f32")
        if cache_dir and os.path.exists(cached_lab) and os.path.exists(cached_cmp):
            labs[uid] = load_binary_file(cached_lab, qdim)
            cmps[uid] = load_binary_file(cached_cmp, voc.feature_size)
        else:
            uncached.append(uid)

    # vocoder analysis in batched chunks: one vmapped device call per chunk
    # instead of one dispatch per utterance (the compose-stage hot loop)
    CHUNK = 8
    for k in range(0, len(uncached), CHUNK):
        chunk = uncached[k : k + CHUNK]
        wavs = []
        for uid in chunk:
            wav_path = os.path.join(d.corpus_dir, d.wav_dir, uid + ".wav")
            if not os.path.exists(wav_path):
                raise FileNotFoundError(
                    f"utterance {uid!r}: no waveform at {wav_path} — the "
                    f"corpus layout is <corpus_dir>/{d.wav_dir}/<id>.wav "
                    "(Merlin layout; see README 'Real corpora'); check "
                    "DataConfig.corpus_dir/wav_dir and the file-id list"
                )
            fs, wav = load_wav(wav_path)
            if fs != cfg.vocoder.fs:
                raise ValueError(
                    f"{wav_path}: sample rate {fs} != configured vocoder fs "
                    f"{cfg.vocoder.fs} — either resample the corpus (e.g. "
                    f"`sox in.wav -r {cfg.vocoder.fs} out.wav`) or set "
                    f"vocoder.fs={fs} in the config (48 kHz sources are "
                    "common; analysis conventions are fs-aware)"
                )
            wavs.append(wav)
        for uid, cmp_ in zip(chunk, voc.analyze_batch(wavs)):
            cmps[uid] = cmp_
            lab_path = os.path.join(d.corpus_dir, d.label_dir, uid + ".lab")
            if not os.path.exists(lab_path):
                raise FileNotFoundError(
                    f"utterance {uid!r}: no HTS label at {lab_path} — the "
                    f"corpus layout is <corpus_dir>/{d.label_dir}/<id>.lab "
                    "(state- or phone-aligned full-context labels with HTK "
                    "100 ns times); set DataConfig.label_dir if the corpus "
                    "uses a different directory (Merlin: label_state_align "
                    "or label_phone_align)"
                )
            labs[uid] = binarize_label_file(lab_path, questions, shift_sec)
            # alignment sanity: the label clock and the waveform must agree
            # on the utterance length. Small deltas (end-of-file rounding,
            # trailing silence trims) are normal and cropped to min when
            # batching; a large one means wrong alignment files, a wrong
            # shift_ms, or labels from a different audio cut — say so now
            # instead of training on misaligned frames.
            nl, nc = labs[uid].shape[0], cmps[uid].shape[0]
            if abs(nl - nc) > max(20, int(0.05 * max(nl, nc))):
                print_log(
                    f"WARNING utterance {uid!r}: label frames ({nl}) and "
                    f"acoustic frames ({nc}) disagree by {abs(nl - nc)} "
                    f"(> 100 ms and > 5%) — check that {lab_path} aligns "
                    f"this exact audio and that vocoder.shift_ms "
                    f"({cfg.vocoder.shift_ms}) matches the alignment's "
                    "frame shift; the overhang will be cropped"
                )
            if cache_dir:
                save_binary_file(os.path.join(cache_dir, uid + ".lab.f32"), labs[uid])
                save_binary_file(os.path.join(cache_dir, uid + ".cmp.f32"), cmp_)
    labs = [labs[uid] for uid in fileids]
    cmps = [cmps[uid] for uid in fileids]
    print_log(f"composed {len(fileids)} utterances ({len(uncached)} analyzed)")

    full = Dataset(labs=labs, cmps=cmps, ids=list(fileids))
    tr_ids, va_ids, te_ids = split_fileids(list(fileids), d.num_valid, d.num_test)
    train = full.subset(tr_ids)

    in_stats = compute_minmax(train.labs)
    # bounded [0,1] streams stay un-rescaled (the reference's noise-mask
    # variant): PML's nm, WORLD's vuv + band aperiodicity
    keep = [voc.streams[k] for k in ("nm", "vuv", "bap") if k in voc.streams]
    out_stats = compute_meanstd(train.cmps, keep_streams=keep)

    if cfg.data.label_dim > 0 and full.label_dim != cfg.data.label_dim:
        print_log(
            f"note: composed label dim {full.label_dim} != configured "
            f"data.label_dim {cfg.data.label_dim} (the composed value is "
            f"authoritative; the config field is declarative)"
        )

    def norm(ds: Dataset) -> Dataset:
        if not normalize:
            return ds
        # in-place via the native data plane (the arrays are pipeline-fresh
        # and referenced only by this corpus); numpy fallback inside
        return Dataset(
            labs=[
                native.normalize_inplace(l, in_stats.shift, in_stats.scale)
                for l in ds.labs
            ],
            cmps=[
                native.normalize_inplace(c, out_stats.shift, out_stats.scale)
                for c in ds.cmps
            ],
            ids=ds.ids,
        )

    return ComposedCorpus(
        train=norm(train),
        valid=norm(full.subset(va_ids)),
        test=norm(full.subset(te_ids)),
        in_stats=in_stats,
        out_stats=out_stats,
    )
