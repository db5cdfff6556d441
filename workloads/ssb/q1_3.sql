SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
  AND year(o_orderdate) = 1995 AND day(o_orderdate) BETWEEN 1 AND 15
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity BETWEEN 26 AND 35
