from limap_tpu.line2d.sold2.sold2 import (SOLD2Detector,  # noqa: F401
                                          SOLD2Extractor, SOLD2Matcher)
