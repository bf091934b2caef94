from wsiseg_tpu.slides.reader import (  # noqa: F401
    SlideReader,
    ArraySlide,
    SyntheticSlide,
    VirtualPyramidSlide,
    open_slide,
)

# NativeSlide / write_raw_pyramid / write_tiled_pyramid live in
# wsiseg_tpu.slides.native (imported lazily — they build the C++ library
# on first use).
