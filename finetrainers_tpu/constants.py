"""Global constants and environment knobs.

Capability parity with reference `finetrainers/constants.py` (env-var knobs at
reference constants.py:6-9, LLM caption prefixes at :61-81).
"""

import os


DEFAULT_HEIGHT_BUCKETS = [256, 512, 768, 1024]
DEFAULT_WIDTH_BUCKETS = [256, 512, 768, 1024]
DEFAULT_FRAME_BUCKETS = [1, 49]

DEFAULT_IMAGE_RESOLUTION_BUCKETS = [(h, w) for h in DEFAULT_HEIGHT_BUCKETS for w in DEFAULT_WIDTH_BUCKETS]
DEFAULT_VIDEO_RESOLUTION_BUCKETS = [
    (f, h, w) for f in DEFAULT_FRAME_BUCKETS for h in DEFAULT_HEIGHT_BUCKETS for w in DEFAULT_WIDTH_BUCKETS
]

PRECOMPUTED_DIR_NAME = "finetrainers-precomputed-data"
PRECOMPUTED_CONDITIONS_DIR_NAME = "conditions"
PRECOMPUTED_LATENTS_DIR_NAME = "latents"

# Env knobs (names kept compatible with the reference so user scripts port over).
FINETRAINERS_LOG_LEVEL = os.environ.get("FINETRAINERS_LOG_LEVEL", "INFO")
# "auto": TPU flash kernel for long self-attention, XLA fused otherwise.
FINETRAINERS_ATTN_PROVIDER = os.environ.get("FINETRAINERS_ATTN_PROVIDER", "auto")
FINETRAINERS_ATTN_CHECKS = os.environ.get("FINETRAINERS_ATTN_CHECKS", "0") in ("1", "true", "TRUE", "True")
FINETRAINERS_ENABLE_TIMING = os.environ.get("FINETRAINERS_ENABLE_TIMING", "1") in ("1", "true", "TRUE", "True")

SUPPORTED_IMAGE_FILE_EXTENSIONS = ["jpg", "jpeg", "png", "webp"]
SUPPORTED_VIDEO_FILE_EXTENSIONS = ["mp4", "mov", "webm", "avi", "gif"]

CAPTION_COLUMN_NAMES = [
    "caption", "captions", "short_caption", "long_caption", "prompt", "prompts",
    "short_prompt", "long_prompt", "description", "descriptions", "text", "texts",
    "alt_text", "alt_texts", "alt_caption", "alt_captions", "image_description",
    "image_descriptions", "video_description", "video_descriptions", "title", "titles",
]

IMAGE_COLUMN_NAMES = ["image", "images", "frame", "frames", "jpg", "jpeg", "png", "webp"]
VIDEO_COLUMN_NAMES = ["video", "videos", "mp4", "mov", "webm", "avi", "gif"]

# Prefixes that LLM captioners commonly prepend; stripped during preprocessing
# (reference constants.py:61-81 behavior).
COMMON_LLM_START_PHRASES = (
    "The video",
    "In this video",
    "In this detailed video",
    "The image",
    "In this image",
    "In this detailed image",
    "Here is a",
    "Here's a",
    "This video",
    "This image",
    "This detailed video",
    "This detailed image",
    "In the video",
    "In the image",
    "A video of",
    "A video showing",
    "An image of",
    "An image showing",
    "The animated video",
    "The animated image",
    "The scene",
)
