"""Deterministic reference-shaped fixture generator (FIXTURES.md §2).

Synthesizes the four bronze inputs (products/carts/users/orders raw)
with every distribution the silver/gold semantics need to be
observable: ~10% duplicated business ids with later-timestamp payloads
(W1/S8), equal-timestamp ties (tie-break determinism), total=0 carts
(F11), nulls (F2/A7), mixed-case+padded strings (F1), invalid
emails/genders/ages (P9), multi-source rows (U1), ≥30 distinct dates
(P10/A10/S9), orphan cart userIds (J1).

Used by the pipeline runner's demo mode and the unit tests. Pure
stdlib `random.Random(seed)` — same records everywhere.
"""

from __future__ import annotations

import random
from datetime import date, datetime, timedelta
from decimal import Decimal

BASE_TS = datetime(2024, 1, 1, 0, 0, 0)
CATEGORIES = ["electronics", "clothing", "home", "toys", "sports", "books", "garden", "beauty"]
SOURCES = ["fakestore", "dummyjson"]


def _ts(rng: random.Random, day_span: int = 35) -> datetime:
    return BASE_TS + timedelta(
        days=rng.randrange(day_span), seconds=rng.randrange(86400)
    )


def products_raw(n: int = 1000, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        pid = i % int(n * 0.9)  # ~10% duplicated ids
        ts = _ts(rng)
        if i >= int(n * 0.9) and rng.random() < 0.3:
            ts = rows[pid]["_ingestion_timestamp"]  # equal-ts tie
        rows.append(
            dict(
                id=pid,
                title=f"Product {pid} v{i}",
                price=Decimal(f"{rng.randrange(0, 100000)}.{rng.randrange(100):02d}"),
                category=rng.choice(CATEGORIES),
                description=None if rng.random() < 0.1 else f"desc {i}",
                image=None if rng.random() < 0.2 else f"img/{pid}.png",
                rating=None
                if rng.random() < 0.1
                else Decimal(f"{rng.randrange(6)}.{rng.randrange(100):02d}")
                .min(Decimal("5.00")),
                _ingestion_timestamp=ts,
                _source_name=rng.choice(SOURCES),
                _endpoint="/products",
                _table_name="products_raw",
            )
        )
    return rows


def carts_raw(n: int = 1000, n_users: int = 300, seed: int = 11) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        cid = i % int(n * 0.9)
        total = Decimal("0.00") if rng.random() < 0.05 else Decimal(
            f"{rng.randrange(1, 500000)}.{rng.randrange(100):02d}"
        )
        disc = (total * Decimal(rng.randrange(0, 101)) / 100).quantize(Decimal("0.01"))
        lines = [
            dict(
                productId=rng.randrange(900),
                quantity=rng.randrange(1, 6),
                price=Decimal(f"{rng.randrange(1, 10000)}.{rng.randrange(100):02d}"),
            )
            for _ in range(rng.randrange(1, 5))
        ]
        rows.append(
            dict(
                id=cid,
                userId=rng.randrange(int(n_users * 1.2)),  # ~20% orphans
                total=total,
                discountedTotal=disc,
                products=lines,
                totalProducts=len(lines),
                totalQuantity=sum(line["quantity"] for line in lines),
                _ingestion_timestamp=_ts(rng),
                _source_name="dummyjson",
                _endpoint="/carts",
                _table_name="carts_raw",
            )
        )
    return rows


def users_raw(n: int = 1000, seed: int = 13) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        uid = i % int(n * 0.9)
        email_base = f"user{uid % int(n * 0.85)}@Example.COM"
        email = (
            None
            if rng.random() < 0.02
            else ("bad-email" if rng.random() < 0.02 else f"  {email_base} ")
        )
        rows.append(
            dict(
                id=uid,
                username=f"  User_{uid}  ",
                email=email,
                gender=rng.choice(["male", "female", "male", "female", "unknown"]),
                phone=f"+1 (555) {rng.randrange(1000):03d}-{rng.randrange(10000):04d}x",
                firstname=None if rng.random() < 0.05 else f"First{uid}",
                lastname=None if rng.random() < 0.05 else f"Last{uid}",
                city=f"City{rng.randrange(50)}",
                age=rng.choice([rng.randrange(0, 100)] * 9 + [rng.randrange(151, 200)]),
                name=dict(first=f"First{uid}", last=f"Last{uid}"),
                address=dict(
                    city=f"City{rng.randrange(50)}",
                    street=f"{rng.randrange(999)} Main St",
                    zipcode=f"{rng.randrange(99999):05d}",
                    geolocation=dict(
                        lat=f"{rng.uniform(-90, 90):.4f}",
                        long=f"{rng.uniform(-180, 180):.4f}",
                    ),
                ),
                _ingestion_timestamp=_ts(rng),
                _source_name=rng.choice(SOURCES + ["randomuser"]),
                _endpoint="/users",
                _table_name="users_raw",
            )
        )
    return rows


def orders_raw(n: int = 1000, n_users: int = 300, seed: int = 17) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        oid = i % int(n * 0.9)
        rows.append(
            dict(
                id=oid,
                userId=rng.randrange(n_users),
                date=date(2024, 1, 1) + timedelta(days=rng.randrange(35)),
                total_amount=None
                if rng.random() < 0.05
                else Decimal(f"{rng.randrange(1, 300000)}.{rng.randrange(100):02d}"),
                _ingestion_timestamp=_ts(rng),
                _source_name="dummyjson",
                _endpoint="/orders",
                _table_name="orders_raw",
            )
        )
    return rows
