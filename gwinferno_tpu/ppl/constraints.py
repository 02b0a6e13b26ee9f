"""Support constraints and the ``biject_to`` registry mapping each support to
its unconstraining bijector."""

from __future__ import annotations

from .transforms import ExpTransform
from .transforms import IdentityTransform
from .transforms import IntervalTransform
from .transforms import OrderedTransform
from .transforms import StickBreakingTransform

__all__ = [
    "Constraint",
    "real",
    "real_vector",
    "positive",
    "unit_interval",
    "interval",
    "simplex",
    "ordered",
    "integer",
    "biject_to",
]


class Constraint:
    """A support descriptor; ``is_discrete`` marks non-NUTS-able sites."""

    is_discrete = False
    event_dims = 0

    def __init__(self, name, transform_factory):
        self.name = name
        self._transform_factory = transform_factory

    def transform(self):
        return self._transform_factory()

    def __repr__(self):
        return f"Constraint({self.name})"


class _Interval(Constraint):
    def __init__(self, low, high):
        self.low, self.high = low, high
        super().__init__(f"interval({low}, {high})", lambda: IntervalTransform(low, high))


class _Discrete(Constraint):
    is_discrete = True

    def __init__(self):
        super().__init__("integer", IdentityTransform)


class _Simplex(Constraint):
    event_dims = 1

    def __init__(self):
        super().__init__("simplex", StickBreakingTransform)


class _Ordered(Constraint):
    event_dims = 1

    def __init__(self):
        super().__init__("ordered", OrderedTransform)


real = Constraint("real", IdentityTransform)
real_vector = Constraint("real_vector", IdentityTransform)
real_vector.event_dims = 1
positive = Constraint("positive", ExpTransform)
unit_interval = _Interval(0.0, 1.0)
simplex = _Simplex()
ordered = _Ordered()
integer = _Discrete()


def interval(low, high):
    return _Interval(low, high)


def biject_to(constraint):
    """Return the unconstrained->constrained bijector for ``constraint``."""
    return constraint.transform()
