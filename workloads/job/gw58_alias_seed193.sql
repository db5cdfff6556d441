-- generated: QueryGenerator.aliasWalkQuery(seed = 193,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = true)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM supplier s1, lineitem l1, supplier s2, nation n1, orders o1, nation n2, customer c1, nation n3, customer c2, orders o2, events e1, region r1 WHERE l1.l_suppkey = s1.s_suppkey AND s2.s_suppkey = l1.l_suppkey AND n1.n_nationkey = s1.s_nationkey AND o1.o_orderkey = l1.l_orderkey AND n2.n_nationkey = s1.s_nationkey AND c1.c_custkey = o1.o_custkey AND n3.n_nationkey = s1.s_nationkey AND c2.c_custkey = o1.o_custkey AND o2.o_orderkey = l1.l_orderkey AND e1.user_id = c2.c_custkey AND r1.r_regionkey = n3.n_regionkey AND o1.o_orderpriority = '5-LOW' AND n1.n_name = 'NATION_19' AND (n3.n_name = 'NATION_15' OR c2.c_mktsegment = 'HOUSEHOLD')
