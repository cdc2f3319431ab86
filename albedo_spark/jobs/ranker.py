"""LR ranker job (E3): the reference's full DAG — profiles → balanced
training set → feature pipeline → LR → AUC, then candidate-union serving
→ per-user top-k → NDCG@30 (``S/LogisticRegressionRanker.scala``,
Makefile:190-213). Defaults are downsized for fixture-scale smoke runs;
pass --max-iter 300 --ratio 1.0 etc. for reference-parity training."""

from __future__ import annotations

import sys

from albedo_spark.jobs import common
from albedo_spark.pipelines import build_repo_profile, build_user_profile
from albedo_spark.pipelines.ranker import (
    balance_starring,
    fit_feature_pipeline,
    build_model_pipeline,
    cast_booleans,
    evaluate_auc,
    rank_candidates,
    reduce_starring,
)
from albedo_spark.recommenders import PopularityRecommender
from albedo_spark.recommenders.popularity import build_popular_repo_df


def main(argv: list[str] | None = None) -> float:
    parser = common.build_parser(__doc__)
    parser.add_argument("--max-iter", type=int, default=10)
    parser.add_argument("--max-starred", type=int, default=100)
    parser.add_argument("--ratio", type=float, default=1.0)
    args = parser.parse_args(argv)
    spark = common.get_session(args, "ranker")
    tables = common.load_tables(spark, args)

    up = build_user_profile(
        tables["user_info"], tables["repo_info"], tables["starring"],
        company_bin_threshold=2, location_bin_threshold=5,
    ).cache()
    rp = build_repo_profile(
        tables["repo_info"], tables["starring"], language_bin_threshold=5
    ).cache()

    reduced = reduce_starring(tables["starring"], args.max_starred)
    popular = [
        r.repo_id
        for r in build_popular_repo_df(tables["repo_info"]).limit(30).collect()
    ]
    balanced = balance_starring(reduced, popular, ratio=args.ratio)
    dataset = cast_booleans(balanced.join(up, "user_id").join(rp, "repo_id")).cache()

    feature_model = fit_feature_pipeline(dataset, min_df=1.0)
    featured = feature_model.transform(dataset).cache()
    train, test = featured.randomSplit([0.8, 0.2], seed=42)
    model = build_model_pipeline(maxIter=args.max_iter).fit(train)
    auc = evaluate_auc(model, test)
    print(f"ranker areaUnderROC = {auc}")

    test_users = common.sample_test_users(tables["starring"], args.eval_sample)
    pop = PopularityRecommender(
        popular_repo_df=build_popular_repo_df(tables["repo_info"]), topK=args.top_k
    )
    # rank_candidates emits (user_id, repo_id, p1); evaluate on p1 as score
    ranked = rank_candidates(
        [pop.transform(test_users)], up, rp, feature_model, model, top_k=args.top_k
    ).withColumnRenamed("p1", "score")
    ndcg = common.evaluate_ndcg(
        ranked, tables["starring"], test_users, args.top_k
    )
    print(f"ranker NDCG@{args.top_k} = {ndcg}")
    return auc


if __name__ == "__main__":
    main(sys.argv[1:])
