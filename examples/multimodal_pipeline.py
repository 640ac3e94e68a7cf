"""Multimodal-column pipeline on mimir_spark: four REAL pure-Python
container decodes (BMP, PNG, PCM WAV, multi-frame GIF) over binary
columns, then the multimodal curation ops a training-data pipeline
runs — cross-format image content dedup, video-ish frame sampling,
and frame-level audio features.

Every decode here is a genuine parse (PNG inflates and unfilters;
GIF runs a complete LZW decoder), not a stub — the test suite
cross-validates them against javax.imageio / stdlib wave.

Run: python examples/multimodal_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimir_spark.operators.multimodal import (
    multimodal_audio_features,
    multimodal_decode_bmp,
    multimodal_decode_png,
    multimodal_decode_wav,
    multimodal_dedup_images,
    multimodal_frame_sample_gif,
)
from mimir_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal_pipeline_example")

    bmp = multimodal_decode_bmp(spark, sf_dir)
    png = multimodal_decode_png(spark, sf_dir)
    print("BMP decode :", bmp.count(), "images;",
          "PNG decode :", png.count(), "images (same pixel contract)")

    dups = multimodal_dedup_images(spark, sf_dir)
    print("image dedup:", dups.count(), "cross-format duplicate groups")
    dups.orderBy("survivor_id").show(5)

    wav = multimodal_decode_wav(spark, sf_dir)
    print("WAV decode :", wav.count(), "clips")
    feats = multimodal_audio_features(spark, sf_dir)
    feats.orderBy("doc_id").show(5)

    frames = multimodal_frame_sample_gif(spark, sf_dir)
    print("GIF frames :", frames.count(), "docs frame-sampled")
    frames.orderBy("doc_id").show(5)


if __name__ == "__main__":
    main()
