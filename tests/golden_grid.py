"""Shared case list for the golden-grid snapshot tests.

Mirrors the parameter grid of the reference's cross-version regression
harness (reference: test/integrated_test.R:76-129): histgrowth on chrM
across grouping x count x multi-threshold combinations, plus the BED
subset/exclude masks shipped in the reference's test/bed_chrM.
"""

import os

CHRM = "/root/reference/test/chrM_test.gfa"
BED = "/root/reference/test/bed_chrM"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

THRESH = ["-q", "0,0.5,1.0", "-l", "0,1,2"]

CASES = [
    # grouping x count grid with the integrated_test.R threshold set
    (
        f"histgrowth_{grp_name}_{count}",
        ["histgrowth", grp_flag, "-a", "-c", count, *THRESH, CHRM],
    )
    for grp_name, grp_flag in (("sample", "-S"), ("haplotype", "-H"))
    for count in ("node", "bp", "edge")
] + [
    # BED subset/exclude masks (bed_chrM fixtures)
    (
        "hist_subset_bed1_node",
        ["hist", "-S", "-c", "node", "-s", f"{BED}/inclusion.bed1", CHRM],
    ),
    (
        "hist_subset_bed1_bp",
        ["hist", "-S", "-c", "bp", "-s", f"{BED}/inclusion.bed1", CHRM],
    ),
    (
        "hist_subset_bed3_node",
        ["hist", "-S", "-c", "node", "-s", f"{BED}/inclusion.bed3", CHRM],
    ),
    (
        "hist_subset_sub_bed1_bp",
        ["hist", "-S", "-c", "bp", "-s", f"{BED}/inclusion_sub.bed1", CHRM],
    ),
    (
        "hist_exclude_bed3_node",
        ["hist", "-S", "-c", "node", "-e", f"{BED}/exclusion.bed3", CHRM],
    ),
    (
        "hist_subset_exclude_bp",
        [
            "hist", "-S", "-c", "bp",
            "-s", f"{BED}/inclusion.bed1",
            "-e", f"{BED}/exclusion.bed3",
            CHRM,
        ],
    ),
    (
        "hist_subset_chm13_edge",
        ["hist", "-S", "-c", "edge", "-s", f"{BED}/inclusion_chm13.bed1", CHRM],
    ),
    # ordered growth + similarity + table on the same graph
    (
        "ordered_histgrowth_sample_bp",
        ["ordered-histgrowth", "-S", "-c", "bp", *THRESH, CHRM],
    ),
    (
        "similarity_sample_node",
        ["similarity", "-S", "-c", "node", CHRM],
    ),
    (
        "table_total_sample_node",
        ["table", "-S", "-a", "-c", "node", CHRM],
    ),
    (
        "info_sample",
        ["info", "-S", CHRM],
    ),
]
