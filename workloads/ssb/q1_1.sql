SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
  AND year(o_orderdate) = 1996
  AND l_discount BETWEEN 0.01 AND 0.03 AND l_quantity < 25
