SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
  AND year(o_orderdate) = 1997 AND month(o_orderdate) <= 3
  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity BETWEEN 26 AND 35
