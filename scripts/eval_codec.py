"""Evaluate a MusicVAE codec artifact: token- and note-level fidelity.

Token accuracy (position-wise) is the train-time metric, but it is brittle
for performance-event streams: one inserted or dropped event misaligns every
later position even when the decoded music is nearly identical. This tool
adds the fair metric — decode the round-tripped chunk back to notes and
score note-level precision/recall/F1 on (instrument stream, pitch, onset
step), plus optional duration and velocity-bin agreement among matched
notes.

Usage:
    python scripts/eval_codec.py --mode=multi \
        --vae_params=checkpoints/musicvae-multi.pkl \
        --input='corpus_multi/*.mid' --max_chunks=1024
"""
from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("input", None, "Glob of evaluation MIDI files.")
flags.DEFINE_string("vae_params", None,
                    "Codec artifact; defaults to the shipped codec for the "
                    "chosen mode.")
flags.DEFINE_enum("mode", "melody", ["melody", "melody16", "multi"],
                  "Codec family (melody16: the 16-bar hierdec codec).")
flags.DEFINE_integer("max_chunks", 1024, "Evaluation chunk cap.")
flags.DEFINE_integer("batch_size", 256, "Encode/decode batch size.")
flags.DEFINE_integer("seed", 0, "Shuffle seed.")


from smd_tpu.eval.midi_metrics import note_f1  # noqa: E402


def main(argv):
    del argv
    from smd_tpu.codec import midi_io
    from smd_tpu.codec import musicvae as mv
    from smd_tpu.utils import io as io_lib

    if FLAGS.mode == "multi":
        from smd_tpu.config import MUSIC_VAE_CONFIG
        entry = MUSIC_VAE_CONFIG["multi-1-big"]
        converter, config = entry.data_converter, entry.model
        spq = converter.steps_per_quarter
    elif FLAGS.mode == "melody16":
        from smd_tpu.config import MUSIC_VAE_CONFIG
        entry = MUSIC_VAE_CONFIG["melody-16-big"]
        converter, config = entry.data_converter, entry.model
        spq = converter.steps_per_quarter
    else:
        from smd_tpu.codec.melody import melody_2bar_converter
        converter, config = melody_2bar_converter, mv.MEL_2BAR_BIG
        spq = 4
    params = io_lib.load(FLAGS.vae_params) if FLAGS.vae_params else None
    vae = mv.TrainedMusicVAE(params=params, config=config,
                             converter=converter)
    if vae.random_weights:
        raise ValueError("no trained codec params found for this mode")

    files = sorted(glob.glob(os.path.expanduser(FLAGS.input), recursive=True))
    rng = np.random.default_rng(FLAGS.seed)
    rng.shuffle(files)
    chunks = []
    for path in files:
        try:
            ns = midi_io.read_midi_file(path)
        except Exception:
            continue
        if FLAGS.mode == "multi":
            chunks.extend(converter.to_tensors(ns).inputs)
        else:
            from smd_tpu.codec.melody import extract_melodies
            stride = converter.slice_bars   # non-overlapping chunks
            for m in extract_melodies(ns):
                chunks.extend(converter.to_tensors(m).inputs[::stride])
        if len(chunks) >= FLAGS.max_chunks:
            break
    chunks = chunks[:FLAGS.max_chunks]
    if not chunks:
        raise ValueError("no chunks extracted")
    logging.info("Evaluating %d chunks", len(chunks))

    tok_accs, tok_np_accs, ps, rs, f1s = [], [], [], [], []
    for i in range(0, len(chunks), FLAGS.batch_size):
        batch = chunks[i:i + FLAGS.batch_size]
        z, mu, sigma = vae.encode_tensors(batch)
        tokens = vae.decode_to_tensors(mu)
        labels = np.stack([c.argmax(-1) for c in batch])
        hits = tokens == labels
        tok_accs.append(hits.mean())
        mask = labels != 0
        tok_np_accs.append((hits * mask).sum() / max(mask.sum(), 1))
        real_list = converter.from_tensors(labels)
        dec_list = converter.from_tensors(tokens)
        for real_ns, dec_ns in zip(real_list, dec_list):
            p, r, f1 = note_f1(real_ns, dec_ns, spq)
            ps.append(p)
            rs.append(r)
            f1s.append(f1)

    print(f"token_acc            {np.mean(tok_accs):.4f}")
    print(f"token_acc_nonpad     {np.mean(tok_np_accs):.4f}")
    print(f"note_precision       {np.mean(ps):.4f}")
    print(f"note_recall          {np.mean(rs):.4f}")
    print(f"note_f1              {np.mean(f1s):.4f}")


if __name__ == "__main__":
    flags.mark_flag_as_required("input")
    app.run(main)
