"""Digital predistortion computation engine.

Port of the reference's DPDCE (python/dpdce.py, python/dpd/*): measure
timestamp-aligned TX/RX bursts from the SDR feedback port, extract binned
AM/AM + AM/PM statistics, fit the memoryless polynomial model by least
squares, and push the updated coefficients into the running modulator over
remote control.
"""
from .measure import Measure  # noqa: F401
from .extract_statistic import ExtractStatistic  # noqa: F401
from .model_poly import Poly  # noqa: F401
from .adapt import Adapt  # noqa: F401
