"""Word2Vec corpus + model job (``S/Word2VecCorpusBuilder.scala``,
Makefile:186: vectorSize=200, window=5, minCount=10, maxIter=30 for
reference parity; downsized defaults here for fixture-scale runs)."""

from __future__ import annotations

import sys

from albedo_spark.jobs import common
from albedo_spark.pipelines import build_repo_profile, build_user_profile
from albedo_spark.pipelines.word2vec_corpus import build_corpus, train_word2vec


def main(argv: list[str] | None = None) -> int:
    parser = common.build_parser(__doc__)
    parser.add_argument("--vector-size", type=int, default=16)
    parser.add_argument("--min-count", type=int, default=2)
    parser.add_argument("--max-iter", type=int, default=2)
    args = parser.parse_args(argv)
    spark = common.get_session(args, "word2vec")
    tables = common.load_tables(spark, args)
    up = build_user_profile(tables["user_info"], tables["repo_info"], tables["starring"])
    rp = build_repo_profile(tables["repo_info"], tables["starring"])
    corpus = build_corpus(up, rp)
    model = train_word2vec(
        corpus,
        vectorSize=args.vector_size,
        minCount=args.min_count,
        maxIter=args.max_iter,
    )
    n = model.getVectors().count()
    print(f"word2vec vocabulary size = {n}")
    model.getVectors().show(10, truncate=40)
    return n


if __name__ == "__main__":
    main(sys.argv[1:])
