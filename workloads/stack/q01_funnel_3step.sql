SELECT count(*) AS n_funnels
FROM events s, events c, events p
WHERE s.user_id = c.user_id AND c.user_id = p.user_id
  AND s.event_type = 'signup' AND c.event_type = 'click'
  AND p.event_type = 'purchase'
  AND c.ts > s.ts AND p.ts > c.ts
  AND p.ts < s.ts + INTERVAL 7 DAY
