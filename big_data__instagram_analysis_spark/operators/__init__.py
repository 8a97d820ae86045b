"""Composite operators Spark lacks natively (SURVEY.md §2, §7.4).

Each is a DataFrame-level composition or an Arrow-batched pandas-UDF plan —
never a driver-side loop — so it distributes at 100 TB:

    similarity.py   brute-force cosine top-k (broadcast B, stream A) + LSH scale path
    asof.py         as-of join via union + last-value window (no UDF)
    dedup.py        exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
    sessionize.py   gap-based sessionization (lag + cumulative sum)
"""
