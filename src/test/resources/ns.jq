def base: 10;
def scaled(f): base * f;
