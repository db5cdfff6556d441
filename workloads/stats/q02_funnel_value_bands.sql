SELECT s.user_id, count(*) AS n
FROM events s, events c, events p
WHERE s.user_id = c.user_id AND c.user_id = p.user_id
  AND s.event_type = 'signup'
  AND c.event_type = 'click' AND c.value BETWEEN 100 AND 250
  AND p.event_type = 'purchase' AND p.value BETWEEN 150 AND 300
  AND s.ts < c.ts AND c.ts < p.ts
GROUP BY s.user_id ORDER BY s.user_id
