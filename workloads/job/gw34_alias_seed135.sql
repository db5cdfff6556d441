-- generated: QueryGenerator.aliasWalkQuery(seed = 135,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM part p1, lineitem l1, lineitem l2, orders o1, orders o2, part p2, part p3, lineitem l3 WHERE l1.l_partkey = p1.p_partkey AND l2.l_partkey = p1.p_partkey AND o1.o_orderkey = l2.l_orderkey AND o2.o_orderkey = l1.l_orderkey AND p2.p_partkey = l2.l_partkey AND p3.p_partkey = l1.l_partkey AND l3.l_partkey = p1.p_partkey AND o2.o_orderpriority <> '5-LOW' AND p3.p_brand < 'Brand#19' AND p1.p_size > 5 AND l1.l_returnflag <> 'N'
