"""Deterministic music-domain fixtures per FIXTURES.md.

Generates users.csv, songs.csv and a streams/ folder of CSVs with
every anomaly the reference's operators exist to handle: null keys,
duplicate track_ids, purely-numeric genres, dangling FKs, engineered
rank ties, extra columns. Fixed seed — byte-stable across runs.
"""

from __future__ import annotations

import csv
import random
from pathlib import Path

GENRES = [
    "acoustic", "afrobeat", "alt-rock", "ambient", "anime", "black-metal",
    "deep-house", "j-dance", "mpb", "pagode", "detroit-techno", "indie-pop",
    "sad", "soul", "synth-pop", "opera",
]
DAYS = ["2024-06-25", "2024-06-26", "2024-06-27"]
B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def _track_id(rng: random.Random) -> str:
    return "".join(rng.choice(B62) for _ in range(22))


def generate(base: Path, n_users: int = 200, n_songs: int = 300,
             rows_per_file: int = 300, files_per_day: int = 2) -> dict:
    rng = random.Random(42)
    base.mkdir(parents=True, exist_ok=True)

    users_path = base / "users" / "users.csv"
    users_path.parent.mkdir(parents=True, exist_ok=True)
    with users_path.open("w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["user_id", "user_name", "user_age", "user_country", "created_at"])
        for uid in range(1, n_users + 1):
            country = "United States" if rng.random() < 0.98 else rng.choice(
                ["Brazil", "Japan", "Germany", "Kenya"])
            w.writerow([uid, f"user_{uid}", rng.randint(18, 69), country,
                        f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"])

    songs_path = base / "songs" / "songs.csv"
    songs_path.parent.mkdir(parents=True, exist_ok=True)
    track_ids: list[str] = []
    with songs_path.open("w", newline="") as fh:
        w = csv.writer(fh)
        # extra columns beyond the required subset (contract: ignored)
        w.writerow(["track_id", "track_name", "track_genre", "artists",
                    "popularity", "duration_ms"])
        for i in range(n_songs):
            tid = _track_id(rng)
            track_ids.append(tid)
            name = f"Song, the {i}th" if i % 37 == 0 else f"Song {i}"
            if rng.random() < 0.005:
                name = ""  # null track_name → dropped by P6
            genre = rng.choice(GENRES)
            if rng.random() < 0.02:
                genre = rng.choice(["42", "3.14", "7", "100.5"])  # P7 regex filter
            w.writerow([tid, name, genre, f"artist_{i % 40}",
                        rng.randint(0, 100), rng.randint(90_000, 360_000)])
            if rng.random() < 0.01:  # D1: duplicate key, different payload
                w.writerow([tid, f"Song {i} (alt)", rng.choice(GENRES),
                            f"artist_{i % 40}", rng.randint(0, 100),
                            rng.randint(90_000, 360_000)])

    streams_dir = base / "streams"
    streams_dir.mkdir(parents=True, exist_ok=True)
    file_no = 0
    # a small hot set so per-(date,genre) top-3 has real contenders + ties
    hot = track_ids[:10]
    for day in DAYS:
        for _ in range(files_per_day):
            file_no += 1
            with (streams_dir / f"streams{file_no}.csv").open("w", newline="") as fh:
                w = csv.writer(fh)
                w.writerow(["user_id", "track_id", "listen_time"])
                for _ in range(rows_per_file):
                    uid: object = rng.randint(1, n_users)
                    if rng.random() < 0.005:
                        uid = ""  # null user_id → P6
                    tid = rng.choice(hot) if rng.random() < 0.3 else rng.choice(track_ids)
                    if rng.random() < 0.01:
                        tid = _track_id(rng)  # dangling FK → J1 null genre → P7 drop
                    if rng.random() < 0.005:
                        tid = ""
                    ts = f"{day} {rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
                    if rng.random() < 0.003:
                        ts = ""
                    w.writerow([uid, tid, ts])

    return {"users": str(users_path), "songs": str(songs_path),
            "streams": str(streams_dir)}
