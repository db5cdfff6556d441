-- generated: QueryGenerator.aliasWalkQuery(seed = 117,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, orders o1, nation n1, customer c2, orders o2, orders o3, customer c3, region r1, nation n2 WHERE o1.o_custkey = c1.c_custkey AND n1.n_nationkey = c1.c_nationkey AND c2.c_nationkey = n1.n_nationkey AND o2.o_custkey = c1.c_custkey AND o3.o_custkey = c2.c_custkey AND c3.c_custkey = o1.o_custkey AND r1.r_regionkey = n1.n_regionkey AND n2.n_nationkey = c1.c_nationkey AND c3.c_mktsegment > 'AUTOMOBILE' AND n1.n_name > 'NATION_10' AND c1.c_mktsegment < 'FURNITURE'
