"""Reference-parity harness (BASELINE.md target: dup-pair recall ≥ 0.99).

Re-implements the reference's grouping in ~40 lines of plain Python as an
in-test oracle at small n:

* exact digest grouping  — findDuplicates, main.go:807-833 (key = digest
  only; group iff count > 1)
* greedy star clustering — findPerceptualDuplicates, main.go:868-902 (scan
  in input order; seed group; absorb every unvisited j with
  hamming(i,j) <= threshold)

The reference's input order is nondeterministic (hash-worker completion
order, main.go:619-623); we fix it to clip_id order — any fixed order yields
a valid reference grouping, and CC output is order-independent anyway
(SURVEY §7.3). Metric: every oracle dup pair must land in one engine
cluster; recall ≥ 0.99 at the same signature config (64-bit sig,
threshold 10).
"""

import hashlib
import itertools

from file_deduplicator_spark.config import DedupConfig
from file_deduplicator_spark.functions.audio import SIG_FUNCS, hamming64, wav_decode
from file_deduplicator_spark.plans.pipeline import dedup_pipeline


def reference_grouping(rows: list[tuple[str, bytes]], threshold: int, algo: str):
    """rows = [(clip_id, wav_bytes)] in 'input order'. Returns list of
    groups (lists of clip_ids), mirroring the reference's two-phase split:
    rows WITH a perceptual hash go through greedy star, the rest through
    exact digest grouping (main.go:836-866)."""
    with_sig, without_sig = [], []
    for cid, data in rows:
        try:
            pcm, _ = wav_decode(data)
            with_sig.append((cid, SIG_FUNCS[algo](pcm)))
        except ValueError:
            without_sig.append((cid, data))

    groups = []
    # exact path (findDuplicates): map[digest] -> members, count>1
    by_digest: dict[str, list[str]] = {}
    for cid, data in without_sig:
        by_digest.setdefault(hashlib.sha256(data).hexdigest(), []).append(cid)
    groups += [g for g in by_digest.values() if len(g) > 1]

    # greedy star (findPerceptualDuplicates): input-order scan
    visited = set()
    for i, (cid_i, sig_i) in enumerate(with_sig):
        if cid_i in visited:
            continue
        group = [cid_i]
        for cid_j, sig_j in with_sig[i + 1 :]:
            if cid_j in visited:
                continue
            d = hamming64(sig_i, sig_j)
            if 0 <= d <= threshold:
                group.append(cid_j)
                visited.add(cid_j)
        if len(group) > 1:
            visited.add(cid_i)
            groups.append(group)
    return groups


def test_dup_pair_recall_vs_reference(spark, clips_df, clips_fixture):
    cfg = DedupConfig()  # threshold 10, 64-bit dhash — main.go:147 config
    rows = [
        (cid, bytes(b))
        for cid, b in zip(clips_fixture.clips.clip_id, clips_fixture.clips.bytes)
    ]
    ref_groups = reference_grouping(rows, cfg.sim_threshold, cfg.sim_algo)
    ref_pairs = {
        (a, b) if a < b else (b, a)
        for g in ref_groups
        for a, b in itertools.combinations(g, 2)
    }
    assert ref_pairs, "oracle found no duplicate pairs — fixture broken?"

    result = dedup_pipeline(clips_df, cfg)
    pdf = result["clustered"].select("clip_id", "cluster_id").toPandas()
    cmap = dict(zip(pdf.clip_id, pdf.cluster_id))

    hit = sum(1 for a, b in ref_pairs if cmap.get(a) == cmap.get(b))
    recall = hit / len(ref_pairs)
    missed = [(a, b) for a, b in ref_pairs if cmap.get(a) != cmap.get(b)]
    assert recall >= 0.99, f"recall {recall:.4f} over {len(ref_pairs)} ref pairs; missed {missed[:8]}"
