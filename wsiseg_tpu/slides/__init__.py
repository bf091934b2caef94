from wsiseg_tpu.slides.reader import (  # noqa: F401
    SlideReader,
    ArraySlide,
    SyntheticSlide,
    open_slide,
)
