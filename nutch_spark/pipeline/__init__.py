"""Training-data pipeline operators over document/embedding corpora.

Beyond the reference crawler's own operators (SURVEY.md §2), a
web-scale crawl feeds model-training pipelines; these modules provide
the standard corpus-preparation operators, Spark-first:

  - dedup_docs:  exact, n-gram Jaccard, MinHash+LSH, SimHash dedup
  - textstats:   token counting, quality scoring, language ID,
                 document fingerprinting
  - similarity:  brute-force + IVF cosine k-NN over embeddings
  - multimodal:  binary media columns, decode/feature plumbing
"""
