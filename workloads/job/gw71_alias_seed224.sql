-- generated: QueryGenerator.aliasWalkQuery(seed = 224,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM nation n1, customer c1, region r1, orders o1, customer c2, supplier s1, nation n2, customer c3 WHERE c1.c_nationkey = n1.n_nationkey AND r1.r_regionkey = n1.n_regionkey AND o1.o_custkey = c1.c_custkey AND c2.c_custkey = o1.o_custkey AND s1.s_nationkey = n1.n_nationkey AND n2.n_regionkey = r1.r_regionkey AND c3.c_nationkey = n2.n_nationkey AND n1.n_name <> 'NATION_15' AND n2.n_name = 'NATION_16' AND o1.o_orderpriority < '5-LOW' AND o1.o_orderstatus < 'O'
