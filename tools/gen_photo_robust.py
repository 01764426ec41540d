"""Regenerate the _PHOTO_ROBUST_EXPECTED constants in queries.py —
run ONLY when fixtures/photos.parquet changes. Prints the literal list
computed by the repo's own decode → perturb_raster → ahash_words stack
(deterministic pure-integer numpy, so the output is a platform-
independent constant of the fixture bytes)."""

from overpaint_spark.operators.multimodal import phash_perturbed
from overpaint_spark.queries import _photo_assets
from overpaint_spark.session import get_spark


def main() -> None:
    spark = get_spark()
    rows = sorted(
        (r.asset_id, r.perturbation, r.p_w0, r.p_w1)
        for r in phash_perturbed(_photo_assets(spark)).collect()
    )
    print("_PHOTO_ROBUST_EXPECTED = [")
    for a, k, w0, w1 in rows:
        print(f'    ({a}, "{k}", {w0}, {w1}),')
    print("]")


if __name__ == "__main__":
    main()
