"""Audio/video multimodal tier throughput: windowed audio features and
every-k-th frame sampling over deterministic synthetic corpora.

What this pins: the WAV decode + windowed-feature path and the AVI
parse + frame-decode path are narrow no-shuffle binary maps whose
throughput is bounded by numpy kernel work, not Spark overhead — the
posture claim in docs/COVERAGE.md, measured. Run:

    python BENCH/audio_video_bench.py [n_audio] [n_video]

Writes one JSON line + appends a row to BENCH/AUDIO_VIDEO.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ocr_platform_spark import audiocodec, avicodec, multimodal
from ocr_platform_spark.session import get_spark

N_AUDIO = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
N_VIDEO = int(sys.argv[2]) if len(sys.argv) > 2 else 300
AUDIO_SECONDS = 10
RATE = 16000
WINDOW = 400
VIDEO_FRAMES = 24
VID_W, VID_H = 160, 120
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".audio_video", f"a{N_AUDIO}_v{N_VIDEO}")


def _ensure_corpus() -> str:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(fname: str, rows: dict) -> None:
        os.makedirs(os.path.join(CACHE, fname), exist_ok=True)
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)),
                       os.path.join(CACHE, fname, "part-0.parquet"))

    if not os.path.exists(os.path.join(CACHE, "audio.parquet")):
        n = AUDIO_SECONDS * RATE
        i = np.arange(n)
        refs, payloads = [], []
        for d in range(N_AUDIO):
            amp = (1000 + d * 37 % 20000) / 32768.0
            hp = 20 * (1 << (d % 3))
            s = amp * (1.0 - 2.0 * ((i // hp) % 2))
            refs.append(f"a{d}")
            payloads.append(audiocodec.encode_wav(s, RATE, bits=16))
        write("audio.parquet", {"media_ref": refs, "data": payloads})
    if not os.path.exists(os.path.join(CACHE, "video.parquet")):
        refs, payloads = [], []
        base = np.arange(VID_H * VID_W * 3, dtype=np.uint32)
        for d in range(N_VIDEO):
            frames = [
                ((base * (d + 3) + 7 * f) % 256).astype(np.uint8)
                .reshape(VID_H, VID_W, 3)
                for f in range(VIDEO_FRAMES)
            ]
            refs.append(f"v{d}")
            payloads.append(avicodec.encode_avi(frames, codec="dib"))
        write("video.parquet", {"media_ref": refs, "data": payloads})
    return CACHE


def _run_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    d = _ensure_corpus()
    spark = get_spark("audio-video-bench")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # one part-file -> few input splits; at corpus scale the source is
    # many files, so spread the narrow map across the cores here
    audio = spark.read.parquet(f"{d}/audio.parquet").repartition(cpus)
    video = spark.read.parquet(f"{d}/video.parquet").repartition(cpus)

    # warm-up (JVM + codegen), excluded
    _run_noop(multimodal.audio_features(audio.limit(8), WINDOW))
    _run_noop(multimodal.video_frame_features(video.limit(8), every=4))

    t_audio = min(_run_noop(multimodal.audio_features(audio, WINDOW))
                  for _ in range(2))
    t_video = min(
        _run_noop(multimodal.video_frame_features(video, every=4))
        for _ in range(2))

    n_windows = N_AUDIO * (AUDIO_SECONDS * RATE // WINDOW)
    n_sampled = N_VIDEO * ((VIDEO_FRAMES + 3) // 4)
    row = {
        "n_audio": N_AUDIO, "audio_seconds_each": AUDIO_SECONDS,
        "wall_audio_s": round(t_audio, 2),
        "windows_per_sec": round(n_windows / t_audio),
        "audio_realtime_factor": round(
            N_AUDIO * AUDIO_SECONDS / t_audio),
        "n_video": N_VIDEO, "frames_each": VIDEO_FRAMES,
        "wall_video_s": round(t_video, 2),
        "sampled_frames_per_sec": round(n_sampled / t_video),
    }
    print(json.dumps(row))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "AUDIO_VIDEO.json")
    hist = []
    if os.path.exists(out):
        hist = json.load(open(out))
    hist.append(row)
    json.dump(hist, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
