"""Profile text_bpe_tokens at sf0.1: split bpe_train (driver rounds) from
bpe_tokenize (Arrow UDF) and break train into word_counts vs rounds.

Usage: python tools/profile_bpe.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_twitter_big_data_pipeline_spark.session import get_spark
from reddit_twitter_big_data_pipeline_spark.operators import bpe

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))

t0 = time.time()
wc = bpe.word_counts(docs).cache()
n_words = wc.count()
t1 = time.time()
print(f"word_counts: {t1 - t0:.2f}s ({n_words} distinct words)")
wc.unpersist()

t0 = time.time()
merges = bpe.bpe_train(docs, n_merges=30)
t1 = time.time()
print(f"bpe_train(30): {t1 - t0:.2f}s ({len(merges)} merges)")

t0 = time.time()
out = bpe.bpe_tokenize(docs, merges).select("doc_id", "n_bpe")
cnt = out.count()
t1 = time.time()
print(f"bpe_tokenize: {t1 - t0:.2f}s ({cnt} rows)")

t0 = time.time()
merges = bpe.bpe_train(docs, n_merges=30)
t1 = time.time()
print(f"bpe_train(30) again (warm): {t1 - t0:.2f}s")
