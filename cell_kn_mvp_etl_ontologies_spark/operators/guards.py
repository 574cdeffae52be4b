"""Loud-failure guards for the bounded-driver contract (VERDICT r7 #9).

Every driver-side ``collect()`` in this package is legal only under a
documented size contract (Q-scale query matrices, KB-scale codebooks,
sketch-word arrays, 1-row argmaxes).  Exceeding a contract must FAIL
VISIBLY, not degrade silently into a driver bottleneck or OOM: each site
calls :func:`check_driver_bound` with its documented bound, so a caller
who feeds a corpus-scale frame into an audit-tier operator gets an
actionable error naming the routed/distributed alternative instead of a
mystery driver stall.

Counting discipline: data-dependent sides (a query frame, a probe
table) are counted BEFORE collection — one cheap job that prevents the
oversized collect itself; structurally-bounded sides (codebooks of
m·ksub rows, bloom words of m_bits/32 longs) are checked from their
build parameters with no extra job.
"""

from __future__ import annotations


class DriverBoundExceeded(RuntimeError):
    """A bounded-driver collect site was fed more rows than its contract
    allows.  The message names the site, the bound, and the scale path
    to use instead."""


def check_driver_bound(n: int, bound: int, site: str, scale_path: str) -> None:
    """Raise :class:`DriverBoundExceeded` if ``n`` exceeds ``bound``.

    ``site`` names the operator + collected side; ``scale_path`` names
    the distributed alternative the caller should route through.
    """
    if n > bound:
        raise DriverBoundExceeded(
            f"{site}: {n} rows exceed the documented driver-side bound of "
            f"{bound}. This operator's collect is contract-bounded "
            f"(audit/gate tier); at this size use {scale_path} instead, "
            f"or raise the bound explicitly if the driver can hold it."
        )
