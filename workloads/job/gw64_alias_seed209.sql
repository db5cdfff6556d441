-- generated: QueryGenerator.aliasWalkQuery(seed = 209,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM nation n1, region r1, nation n2, region r2, nation n3, region r3, customer c1, orders o1, lineitem l1 WHERE r1.r_regionkey = n1.n_regionkey AND n2.n_regionkey = r1.r_regionkey AND r2.r_regionkey = n2.n_regionkey AND n3.n_regionkey = r1.r_regionkey AND r3.r_regionkey = n2.n_regionkey AND c1.c_nationkey = n2.n_nationkey AND o1.o_custkey = c1.c_custkey AND l1.l_orderkey = o1.o_orderkey AND c1.c_mktsegment > 'AUTOMOBILE' AND n2.n_name <> 'NATION_22' AND n3.n_regionkey = 0 AND (l1.l_linestatus = 'F' OR n2.n_regionkey = 4)
