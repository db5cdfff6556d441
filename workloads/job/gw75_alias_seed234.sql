-- generated: QueryGenerator.aliasWalkQuery(seed = 234,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, lineitem l1, orders o2, customer c1, orders o3, supplier s1, customer c2, nation n1, lineitem l2, lineitem l3, supplier s2 WHERE l1.l_orderkey = o1.o_orderkey AND o2.o_orderkey = l1.l_orderkey AND c1.c_custkey = o2.o_custkey AND o3.o_custkey = c1.c_custkey AND s1.s_suppkey = l1.l_suppkey AND c2.c_custkey = o3.o_custkey AND n1.n_nationkey = c2.c_nationkey AND l2.l_orderkey = o1.o_orderkey AND l3.l_suppkey = s1.s_suppkey AND s2.s_suppkey = l1.l_suppkey AND l2.l_quantity = 18 AND c1.c_mktsegment < 'FURNITURE' AND l1.l_linestatus > 'F' AND o3.o_orderstatus > 'F'
