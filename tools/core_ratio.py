#!/usr/bin/env python3
"""Compute the vs-baseline proxy ratios from a graft.Bench JSON and a
tools/time_duckdb.py JSON — the adjudication recipe for BASELINE.md's
2x gate, persisted so the whole-set/core-set split and the exclusion
lists stop being re-derived (and re-disagreed-on) each round.

Usage: core_ratio.py <bench.json> <duck.json>

Prints whole-timed-set and core-set ratios over the oracle rows BOTH
files carry, with each side's calibration sentinels attached (compare
ratios across sessions only through those denominators).

Exclusion lists (documented in BASELINE.md since round 10):
  - `exact_jaccard_join` is never timed: its oracle is the deliberately
    quadratic all-pairs replay, so the comparison is meaningless.
  - STORE-LIFECYCLE rows: Spark executes the real store lifecycle each
    row certifies (parquet writes, manifest commits, compaction, MV
    refreshes, tombstone-merged reads); DuckDB replays only the
    expected RESULT from the source table. They certify store
    semantics, not query planning.
  - CODEC rows: Spark does real byte work (PNG/WAV/ADPCM/MP4/MKV
    decode, PDF/DOCX/ODT/RTF/HTML extraction); DuckDB replays
    closed-form fixture formulas.
"""
import json
import sys

UNTIMED = {"exact_jaccard_join"}

LIFECYCLE = {
    "q_corpus_timetravel", "q_corpus_merge", "q_corpus_cdf",
    "q_corpus_replica", "q_cdc_apply", "q_store_lookup", "q_store_evolve",
    "q_store_optimize", "q_store_range", "q_store_mv", "q_store_where",
    "q_store_bloom", "q_store_textindex", "q_forget_e2e",
}

CODEC = {
    "media_admit", "media_ann", "media_decode_hdr", "media_frame_near",
    "media_frames", "media_mkv_meta", "media_mp4_meta", "media_near_mixed",
    "media_phash", "media_phash_dedup", "media_phash_near", "media_pixels",
    "media_resize_pixels", "media_scan_meta", "media_wave",
    "media_wave_adpcm",
    "q_pdf_extract", "q_docx_extract", "q_odt_extract", "q_rtf_extract",
    "q_html_extract", "q_extract_chunks", "q_extract_safe",
}


def main() -> None:
    bench = json.load(open(sys.argv[1]))
    duck = json.load(open(sys.argv[2]))
    common = [q for q in duck["queries"]
              if q in bench["queries"] and q not in UNTIMED]
    core = [q for q in common if q not in LIFECYCLE and q not in CODEC]

    # Bench records a FAILED query as a negative elapsed time; summing it
    # unfiltered would silently deflate the Spark total and flatter the
    # ratio the 2x gate adjudicates (r13 advice). A failed row in either
    # file is a hard error — a run with failures is not adjudicable.
    bad = [q for q in common
           if bench["queries"][q] < 0 or duck["queries"][q] < 0]
    if bad:
        sys.exit(f"FAILED queries present (negative time), run not "
                 f"adjudicable: {bad}")

    def tot(side, qs):
        return sum(side["queries"][q] for q in qs)

    for label, qs in (("whole timed set", common), ("core set", core)):
        s, d = tot(bench, qs), tot(duck, qs)
        print(f"{label}: spark {s:.2f}s vs duckdb {d:.2f}s = "
              f"{s / d:.2f}x over {len(qs)} rows")
    print(f"spark calibration: {bench.get('calibration')}")
    print(f"duckdb calibration: {duck.get('calibration')}")
    excluded = [q for q in common if q not in core]
    s, d = tot(bench, excluded), tot(duck, excluded)
    print(f"excluded (lifecycle+codec, {len(excluded)} rows): "
          f"spark {s:.2f}s vs duckdb {d:.2f}s")


if __name__ == "__main__":
    main()
