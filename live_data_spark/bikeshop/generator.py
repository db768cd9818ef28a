"""Spark-native mock-data generator — the reference's MockData, distributed.

Reference: airflow/include/scripts/api/mock_data.py (row-at-a-time Python
loops over Faker + polars). Re-expressed as ``spark.range(n)`` + pure
column expressions (SURVEY.md §3.3): fully parallel, no Python in the row
path, and — unlike the reference — deterministic under a seed so oracle
tests can compare batches bit-for-bit.

Faithful semantics (and conscious deviations, flagged):

- gender domain {'F','M','X'} (mock_data.py:48 passport_gender).
- order_status ∈ {shipped, delivered, refunded} weighted 10:5:1
  (mock_data.py:63); order_date uniform over the last 30 days (:62).
- items/order ∈ {1,2,3} weighted 5:2:1 (:94); quantity {1,2,3} 10:3:1 (:104).
- product pick ∝ Gaussian pdf of price around the median (:70-83) — the
  scipy UDF replaced by the closed-form expression + a cumulative-weight
  range join (no Python, no per-row RNG calls).
- product_cost = price × ONE uniform(0.3,0.5) draw per batch (:31 — the
  per-batch-constant quirk, SURVEY §8.5). Kept.
- DEVIATION (SURVEY §8.1): the reference's order pool indexing bug means
  returning customers never get orders; we implement the documented
  *intent* — the pool is shuffled deterministically before 1:1 assignment,
  so sampled returning customers can order again.
- DEVIATION (SURVEY §8.6): ``loaded_at`` is one timestamp per batch (the
  reference stamps per-row ``now()`` microseconds apart — an artifact of
  its row loop, not a semantic).
"""

from __future__ import annotations

import datetime as _dt
import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from live_data_spark.functions.dialect import gaussian_pdf, weighted_choice

FIRST_NAMES = (
    "Alex Bella Carlos Dana Elena Farid Grace Hugo Iris Jonas Kira Liam "
    "Mona Nils Oscar Priya Quinn Rosa Sam Tara Uma Viktor Wen Xena Yara Zane"
).split()
LAST_NAMES = (
    "Anders Brooks Chen Diaz Evans Fischer Garcia Haas Ito Jensen Kim Lopez "
    "Meyer Novak Okafor Patel Quist Rossi Silva Tanaka Ueda Vogel Weber Xu Yilmaz Zhang"
).split()
CITIES = (
    "Amsterdam Berlin Chicago Denver Eindhoven Florence Geneva Hamburg "
    "Istanbul Jakarta Kyoto Lisbon Madrid Nairobi Oslo Porto Quito Riga "
    "Seoul Tunis Utrecht Vienna Warsaw Xiamen Yokohama Zurich"
).split()
CATEGORIES = ["Road", "Mountain", "Hybrid", "Gravel", "Electric"]
SUBCATEGORIES = {
    "Road": "Elite Road",
    "Mountain": "Trail",
    "Hybrid": "City",
    "Gravel": "Adventure",
    "Electric": "E-Commute",
}
FRAMES = ["Carbon", "Aluminium", "Steel", "Titanium"]
ORDER_STATUSES = ["shipped", "delivered", "refunded"]


def batch_cost_factor(seed: int, batch: int) -> float:
    """uniform(0.3, 0.5) per-batch cost factor (the §8.5 quirk), driver-side.

    md5 of the seed tuple — the driver-side twin of ``_u``'s xxhash64
    recipe. NOT Python's ``hash()``: that one is salted per interpreter for
    str-bearing tuples (PYTHONHASHSEED), which silently broke the module's
    cross-process determinism contract until round 8. Pinned by a
    subprocess-respawn test under two forced hash seeds.
    """
    digest = hashlib.md5(f"{seed}-cost_factor-{batch}".encode()).hexdigest()
    return 0.3 + 0.2 * (int(digest, 16) % 1_000_000) / 1_000_000.0


class MockDataSpark:
    """Deterministic, distributed analog of the reference MockData class."""

    def __init__(
        self,
        spark: SparkSession,
        seed: int = 42,
        anchor_date: _dt.date | None = None,
        loaded_at: _dt.datetime | None = None,
    ):
        self.spark = spark
        self.seed = seed
        self.anchor_date = anchor_date or _dt.date(2026, 8, 13)
        self.loaded_at = loaded_at or _dt.datetime(2026, 8, 13, 0, 0, 0)

    # -- primitive deterministic draws ------------------------------------

    def _u(self, tag: str, batch: int, i) -> F.Column:
        """Uniform [0,1) from (seed, batch, tag, row) — the RNG."""
        h = F.xxhash64(F.lit(self.seed), F.lit(batch), F.lit(tag), i)
        return F.pmod(h, F.lit(1_000_000)).cast("double") / 1_000_000.0

    def _pick(self, pool: list[str], tag: str, batch: int, i) -> F.Column:
        h = F.pmod(F.xxhash64(F.lit(self.seed), F.lit(batch), F.lit(tag), i), F.lit(len(pool)))
        return F.element_at(F.lit(pool), (h + 1).cast("int"))

    def _uuid(self, entity: str, batch: int, i) -> F.Column:
        """Deterministic 32-hex surrogate key (uuid4 analog, SURVEY §7.2d)."""
        return F.md5(F.concat_ws("-", F.lit(self.seed), F.lit(entity), F.lit(batch), i))

    def _loaded_at(self) -> F.Column:
        return F.lit(self.loaded_at).cast("timestamp_ntz")

    # -- tables ------------------------------------------------------------

    def products(self, n: int = 97, batch: int = 0) -> DataFrame:
        """The static product dimension (reference: 97-row seed CSV +
        id/cost/loaded_at enrichment, mock_data.py:27-34).

        Price is a deterministic two-uniform spread (500..13k-ish) so the
        Gaussian purchase-weighting has realistic shape; cost applies the
        per-BATCH uniform(0.3, 0.5) factor quirk.
        """
        i = F.col("id_n")
        cat = self._pick(CATEGORIES, "cat", batch, i)
        # one cost factor for the whole batch: drawn from the seed, not the row
        factor = batch_cost_factor(self.seed, batch)
        price = F.round(500 + self._u("price", batch, i) * self._u("price2", batch, i) * 12500, 0)
        return (
            self.spark.range(n)
            .withColumnRenamed("id", "id_n")
            .select(
                self._uuid("product", batch, i).alias("id"),
                F.concat(F.lit("Bike "), cat, F.lit(" M"), i.cast("string")).alias("model"),
                cat.alias("category"),
                F.element_at(
                    F.lit([SUBCATEGORIES[c] for c in CATEGORIES]),
                    (F.pmod(F.xxhash64(F.lit(self.seed), F.lit(batch), F.lit("cat"), i), F.lit(len(CATEGORIES))) + 1).cast("int"),
                ).alias("subcategory"),
                self._pick(FRAMES, "frame", batch, i).alias("frame"),
                price.alias("price"),
                (price * F.lit(factor)).alias("product_cost"),
                self._loaded_at().alias("loaded_at"),
            )
        )

    def customers(self, n: int = 1000, batch: int = 0) -> DataFrame:
        """Customer batch (reference mock_data.py:40-54)."""
        i = F.col("id_n")
        first = self._pick(FIRST_NAMES, "first", batch, i)
        last = self._pick(LAST_NAMES, "last", batch, i)
        return (
            self.spark.range(n)
            .withColumnRenamed("id", "id_n")
            .select(
                self._uuid("customer", batch, i).alias("id"),
                first.alias("first_name"),
                last.alias("last_name"),
                F.lower(F.concat(first, F.lit("."), last, i.cast("string"), F.lit("@example.com"))).alias(
                    "email"
                ),
                weighted_choice(self._u("gender", batch, i), ["F", "M", "X"], [47, 47, 6]).alias(
                    "gender"
                ),
                self._pick(CITIES, "city", batch, i).alias("city"),
                self._loaded_at().alias("loaded_at"),
            )
        )

    def orders(self, customer_pool: DataFrame, n: int = 1000, batch: int = 0) -> DataFrame:
        """Order batch: 1:1 assignment over a deterministically-shuffled
        customer pool (reference mock_data.py:56-68; pool semantics per the
        documented intent, see module docstring DEVIATION note).

        The pool (≤ ~1050 rows/batch) broadcasts; the join is index
        equality — no shuffle of the orders side.
        """
        w = Window.orderBy(F.xxhash64(F.lit(self.seed), F.lit(batch), F.col("customer_id")))
        pool = customer_pool.select(F.col("id").alias("customer_id")).withColumn(
            "pool_idx", F.row_number().over(w) - 1
        )
        i = F.col("id_n")
        base = (
            self.spark.range(n)
            .withColumnRenamed("id", "id_n")
            .select(
                self._uuid("order", batch, i).alias("id"),
                i.alias("pool_idx"),
                F.date_sub(
                    F.lit(self.anchor_date),
                    F.pmod(F.xxhash64(F.lit(self.seed), F.lit(batch), F.lit("od"), i), F.lit(30)).cast(
                        "int"
                    ),
                ).alias("order_date"),
                weighted_choice(
                    self._u("status", batch, i), ORDER_STATUSES, [10, 5, 1]
                ).alias("order_status"),
                self._loaded_at().alias("loaded_at"),
            )
        )
        return base.join(F.broadcast(pool), "pool_idx").select(
            "id", "customer_id", "order_date", "order_status", "loaded_at"
        )

    def order_products(
        self, products: DataFrame, orders: DataFrame, batch: int = 0
    ) -> DataFrame:
        """Line items: 1-3 per order (weights 5:2:1), product ∝ Gaussian
        pdf of price around the batch median (reference mock_data.py:70-107).

        The scipy per-row UDF becomes: (1) one tiny aggregate for
        median/std, (2) a closed-form pdf column over products, (3) a
        cumulative-weight table via window cumsum, (4) a broadcast range
        join matching each uniform draw to its weight interval. Orders
        explode via sequence() — the reference's Python loop, vectorized.
        """
        stats = products.agg(
            F.median("price").alias("med"), F.stddev("price").alias("std")
        ).collect()[0]
        w = products.select(
            F.col("id").alias("product_id"),
            gaussian_pdf("price", F.lit(stats["med"]), F.lit(stats["std"])).alias("wt"),
        )
        total = w.agg(F.sum("wt")).collect()[0][0]
        win = Window.orderBy("product_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cum = w.select(
            "product_id",
            (F.sum("wt").over(win) / F.lit(total)).alias("cum_hi"),
            ((F.sum("wt").over(win) - F.col("wt")) / F.lit(total)).alias("cum_lo"),
        )

        o = orders.select(F.col("id").alias("order_id"))
        items = o.select(
            "order_id",
            F.explode(
                F.sequence(
                    F.lit(1),
                    weighted_choice(
                        self._u("n_items", batch, F.col("order_id")), [1, 2, 3], [5, 2, 1]
                    ),
                )
            ).alias("item_seq"),
        )
        draw = self._u("prod", batch, F.concat(F.col("order_id"), F.col("item_seq")))
        picked = items.withColumn("u", draw).join(
            F.broadcast(cum), (F.col("u") >= F.col("cum_lo")) & (F.col("u") < F.col("cum_hi"))
        )
        i = F.concat(F.col("order_id"), F.col("item_seq"))
        return picked.select(
            self._uuid("order_product", batch, i).alias("id"),
            "product_id",
            "order_id",
            weighted_choice(self._u("qty", batch, i), [1, 2, 3], [10, 3, 1])
            .cast("int")
            .alias("quantity"),
            self._loaded_at().alias("loaded_at"),
        )

    # -- DAG-level entry points (mock_data.py:116-156) ---------------------

    def seed_initial(self, num_customers: int = 1000, num_orders: int = 1000) -> dict[str, DataFrame]:
        products = self.products()
        customers = self.customers(num_customers, batch=0)
        orders = self.orders(customers, num_orders, batch=0)
        order_products = self.order_products(products, orders, batch=0)
        return {
            "products": products,
            "customers": customers,
            "orders": orders,
            "order_products": order_products,
        }

    def refresh(
        self,
        existing_customers: DataFrame,
        batch: int,
        products: DataFrame | None = None,
        num_customers: int = 1000,
        num_orders: int = 1000,
    ) -> dict[str, DataFrame]:
        """Incremental batch: new customers ++ sampled returning customers
        form the order pool (mock_data.py:136-156).

        ``products`` must be the PERSISTED static dimension (the reference
        re-reads it from disk, mock_data.py:144) — regenerating it under a
        new batch seed would mint new product ids and orphan every line
        item's FK.
        """
        customers = self.customers(num_customers, batch=batch)
        pool = customers.select("id").unionByName(existing_customers.select("id"))
        orders = self.orders(pool, num_orders, batch=batch)
        order_products = self.order_products(
            products if products is not None else self.products(), orders, batch=batch
        )
        return {"customers": customers, "orders": orders, "order_products": order_products}
