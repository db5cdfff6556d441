-- generated: QueryGenerator.aliasWalkQuery(seed = 150,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM orders o1, lineitem l1, supplier s1, lineitem l2, lineitem l3, customer c1, part p1, part p2, part p3, orders o2, nation n1, supplier s2, supplier s3 WHERE l1.l_orderkey = o1.o_orderkey AND s1.s_suppkey = l1.l_suppkey AND l2.l_suppkey = s1.s_suppkey AND l3.l_orderkey = o1.o_orderkey AND c1.c_custkey = o1.o_custkey AND p1.p_partkey = l3.l_partkey AND p2.p_partkey = l2.l_partkey AND p3.p_partkey = l1.l_partkey AND o2.o_orderkey = l2.l_orderkey AND n1.n_nationkey = c1.c_nationkey AND s2.s_suppkey = l1.l_suppkey AND s3.s_suppkey = l1.l_suppkey AND o2.o_orderpriority = '4-NOT SPECIFIED' AND s1.s_nationkey > 2 AND l3.l_linestatus > 'F' AND l3.l_returnflag < 'R'
